package graft.core

/** Exception surface mirroring the reference hierarchy
  * (/root/reference/probables/exceptions.py:4-93) with the same messages
  * where the reference's tests pin them. */
abstract class ProbablesBaseException(val message: String)
    extends RuntimeException(message)

final class InitializationError(msg: String) extends ProbablesBaseException(msg)
final class NotSupportedError(msg: String) extends ProbablesBaseException(msg)
final class SimilarityError(msg: String) extends ProbablesBaseException(msg)
final class CountMinSketchError(msg: String) extends ProbablesBaseException(msg)
