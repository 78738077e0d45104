package graft.etl

import scala.collection.mutable

/** I5 — duplicate target-column detection and auto-rename, reference
  * `ui/mapping_editor.py:506-554`. Case-insensitive, reserved names
  * (raw-JSON + business-audit columns) always count as taken, auto
  * rename appends the first free numeric suffix (`name1`, `name2`, ...).
  */
object TargetColumns {

  /** `_reserved_columns` (`ui/mapping_editor.py:506-508`). */
  val reservedColumns: Seq[String] =
    Seq("raw_json", "ingested_at", "source_collection", "status")

  /** `_detect_duplicate_targets`: the target names (in order) that
    * collide case-insensitively with an earlier target or a reserved
    * name. Blank names are skipped.
    */
  def detectDuplicates(
      targets: Seq[String],
      reserved: Seq[String] = reservedColumns): Seq[String] = {
    val seen = mutable.Set.from(reserved.map(_.toLowerCase))
    val duplicates = Seq.newBuilder[String]
    for (raw <- targets; target = raw.trim if target.nonEmpty) {
      val normalized = target.toLowerCase
      if (seen.contains(normalized)) duplicates += target
      else seen += normalized
    }
    duplicates.result()
  }

  /** `_auto_resolve_duplicates`: resolve collisions by suffixing; returns
    * the updated target list plus the original→renamed map.
    */
  def autoResolveDuplicates(
      targets: Seq[String],
      reserved: Seq[String] = reservedColumns): (Seq[String], Map[String, String]) = {
    val seen = mutable.Set.from(reserved.map(_.toLowerCase))
    val renames = mutable.LinkedHashMap[String, String]()
    val updated = targets.map { raw =>
      val target = raw.trim
      if (target.isEmpty) raw
      else if (!seen.contains(target.toLowerCase)) { seen += target.toLowerCase; target }
      else {
        var counter = 1
        var candidate = s"$target$counter"
        while (seen.contains(candidate.toLowerCase)) {
          counter += 1
          candidate = s"$target$counter"
        }
        renames(target) = candidate
        seen += candidate.toLowerCase
        candidate
      }
    }
    (updated, renames.toMap)
  }
}
