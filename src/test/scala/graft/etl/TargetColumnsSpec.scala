package graft.etl

import org.scalatest.funsuite.AnyFunSuite

/** I5 duplicate-target detection / auto-rename,
  * reference `ui/mapping_editor.py:506-554`.
  */
class TargetColumnsSpec extends AnyFunSuite {

  test("case-insensitive duplicates and reserved collisions detected") {
    val targets = Seq("name", "Name", "raw_json", "amount", "", "AMOUNT")
    assert(TargetColumns.detectDuplicates(targets) == Seq("Name", "raw_json", "AMOUNT"))
  }

  test("no duplicates → empty") {
    assert(TargetColumns.detectDuplicates(Seq("a", "b", "c")).isEmpty)
  }

  test("auto-resolve suffixes the first free counter") {
    val (updated, renames) =
      TargetColumns.autoResolveDuplicates(Seq("name", "name", "name1", "status"))
    // second "name" → name2 because name1 is taken later? reference scans
    // in order: at the time of the second "name", "name1" is NOT yet
    // seen, so it becomes "name1"; the explicit "name1" then collides and
    // becomes "name11"; "status" is reserved → "status1".
    assert(updated == Seq("name", "name1", "name11", "status1"))
    assert(renames == Map("name" -> "name1", "name1" -> "name11", "status" -> "status1"))
  }

  test("blank targets pass through untouched") {
    val (updated, renames) = TargetColumns.autoResolveDuplicates(Seq("", "a", ""))
    assert(updated == Seq("", "a", ""))
    assert(renames.isEmpty)
  }
}
