package graft.etl

/** Error taxonomy of the ETL plane, mirroring the reference's
  * `etl_pipeline/errors.py` split: configuration problems fail fast at
  * plan time, input-shape problems fail fast at scan time, load problems
  * surface from the sink.
  */
sealed abstract class EtlException(message: String) extends RuntimeException(message)

final class ConfigError(message: String) extends EtlException(message)
final class InputError(message: String) extends EtlException(message)
final class LoadError(message: String) extends EtlException(message)
