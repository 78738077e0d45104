package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{LongDotProduct, Md5Prefix60}

/** Session extensions for the graft engine — the Catalyst plug-in point
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `builder.withExtensions(new GraftExtensions)` as [[GraftSession]]
  * does). Injects the native [[Md5Prefix60]] content-hash and
  * [[LongDotProduct]] similarity primitives plus the optimizer rules
  * that collapse their portable composed forms; further rules /
  * strategies would register here the same way.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => graft.plans.RewriteMd5PrefixChain)
    extensions.injectOptimizerRule(_ => graft.plans.RewriteLongDotChain)
    // the native as-of join: marker function consumed by an analysis
    // rule that swaps the marked Join for the dedicated logical node,
    // planned by the injected strategy into the single-pass merge
    extensions.injectResolutionRule(_ => graft.plans.RewriteAsOfMarkerJoin)
    extensions.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    extensions.injectFunction((
      FunctionIdentifier("graft_asof_marker"),
      new ExpressionInfo(
        classOf[graft.plans.GraftAsOfMarker].getName,
        null,
        "graft_asof_marker",
        "graft_asof_marker(left_ts, right_ts, right_id[, tolerance_us]) " +
          "- as-of join condition marker: attach the right row with the " +
          "greatest right_ts <= left_ts (ties: greatest right_id), " +
          "discarded when older than left_ts - tolerance_us",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 3 || children.size == 4,
          s"graft_asof_marker takes 3 or 4 arguments, got ${children.size}")
        graft.plans.GraftAsOfMarker(children(0), children(1), children(2),
          children.lift(3).getOrElse(
            org.apache.spark.sql.catalyst.expressions.Literal(null,
              org.apache.spark.sql.types.LongType)))
      }))
    extensions.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(
        classOf[Md5Prefix60].getName,
        null,
        "md5_prefix60",
        "md5_prefix60(str) - first 60 bits of md5(str) as a non-negative bigint",
        ""),
      (children: Seq[Expression]) => Md5Prefix60(children.head)))
    extensions.injectFunction((
      FunctionIdentifier("long_dot"),
      new ExpressionInfo(
        classOf[LongDotProduct].getName,
        null,
        "long_dot",
        "long_dot(array<bigint>, array<bigint>) - exact integer dot product",
        ""),
      (children: Seq[Expression]) => LongDotProduct(children(0), children(1))))
    // Spark ships BloomFilterMightContain for its runtime-filter rewrite
    // but leaves it out of the public registry; exposing it lets the
    // incremental-dedup router test membership inside codegen instead of
    // through a deserializing UDF. First arg must be a foldable binary
    // (the sketch bytes), second a bigint key.
    extensions.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        null,
        "graft_might_contain",
        "graft_might_contain(binary, bigint) - bloom-filter membership probe",
        ""),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))))
    extensions.injectFunction((
      FunctionIdentifier("graft_bitmap_distinct"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapDistinct].getName,
        null,
        "graft_bitmap_distinct",
        "graft_bitmap_distinct(hash, numBuckets) - occupied-bucket count " +
          "of an m-bit linear-counting bitmap sketch over hash mod m; " +
          "fixed-size mergeable buffer (bitwise OR)",
        ""),
      graft.functions.BitmapDistinct.fromArguments _))
    extensions.injectFunction((
      FunctionIdentifier("graft_bitmap_agg"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapSketchAgg].getName,
        null,
        "graft_bitmap_agg",
        "graft_bitmap_agg(hash, numBuckets) - the m-bit bitmap sketch " +
          "itself (binary) over hash mod m; combine already-aggregated " +
          "sketches with graft_bitmap_{popcount,and_count,or_count}",
        ""),
      graft.functions.BitmapSketchAgg.fromArguments _))
    extensions.injectFunction((
      FunctionIdentifier("graft_bitmap_popcount"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapPopCount].getName,
        null,
        "graft_bitmap_popcount",
        "graft_bitmap_popcount(binary) - occupied-bucket count of a bitmap sketch",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.BitmapPopCount(children.head)))
    extensions.injectFunction((
      FunctionIdentifier("graft_bitmap_and_count"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapAndCount].getName,
        null,
        "graft_bitmap_and_count",
        "graft_bitmap_and_count(binary, binary) - popcount of the sketch intersection",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.BitmapAndCount(children(0), children(1))))
    extensions.injectFunction((
      FunctionIdentifier("graft_bitmap_or_count"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapOrCount].getName,
        null,
        "graft_bitmap_or_count",
        "graft_bitmap_or_count(binary, binary) - popcount of the sketch union",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.BitmapOrCount(children(0), children(1))))
    extensions.injectFunction((
      FunctionIdentifier("graft_bitmap_or_agg"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapOrAgg].getName,
        null,
        "graft_bitmap_or_agg",
        "graft_bitmap_or_agg(binary) - OR-merge aggregate over bitmap " +
          "sketches: rolls per-group sketches up into one union sketch " +
          "without re-reading rows",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.BitmapOrAgg(children.head)))
    extensions.injectFunction((
      FunctionIdentifier("graft_damerau"),
      new ExpressionInfo(
        classOf[graft.functions.DamerauLevenshtein].getName,
        null,
        "graft_damerau",
        "graft_damerau(str, str) - true (unrestricted) Damerau-Levenshtein " +
          "edit distance: insert/delete/substitute/transpose, " +
          "Lowrance-Wagner algorithm",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.DamerauLevenshtein(children(0), children(1))))
    extensions.injectFunction((
      FunctionIdentifier("graft_hll"),
      new ExpressionInfo(
        classOf[graft.functions.HyperLogLogAgg].getName,
        null,
        "graft_hll",
        "graft_hll(hash, numRegisters) - dense-register HyperLogLog over " +
          "a 60-bit hash: struct(v empty registers, s_scaled exact " +
          "harmonic denominator, est integer-exact raw estimate); " +
          "merge = register-wise max",
        ""),
      graft.functions.HyperLogLogAgg.fromArguments _))
    extensions.injectFunction((
      FunctionIdentifier("graft_cms_agg"),
      new ExpressionInfo(
        classOf[graft.functions.CountMinAgg].getName,
        null,
        "graft_cms_agg",
        "graft_cms_agg(buckets, depth, width) - Count-Min sketch from " +
          "precomputed per-depth bucket indices; binary depth*width " +
          "counter grid, merge = cell-wise sum",
        ""),
      graft.functions.CountMinAgg.fromArguments _))
    extensions.injectFunction((
      FunctionIdentifier("graft_cms_query"),
      new ExpressionInfo(
        classOf[graft.functions.CountMinQuery].getName,
        null,
        "graft_cms_query",
        "graft_cms_query(sketch, buckets) - Count-Min point estimate: " +
          "min over the item's depth cells",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.CountMinQuery(children(0), children(1))))
    extensions.injectFunction((
      FunctionIdentifier("graft_variant_tag"),
      new ExpressionInfo(
        classOf[graft.functions.VariantTypeTag].getName,
        null,
        "graft_variant_tag",
        "graft_variant_tag(variant) - physical type tag of a variant " +
          "value as a small int (0 json-null, 1 boolean, 2 long, " +
          "3 decimal, 4 double, 5 string, 6 object, 7 array, 8 other); " +
          "an O(1) header read where schema_of_variant renders a type " +
          "string per row",
        ""),
      (children: Seq[Expression]) =>
        graft.functions.VariantTypeTag(children.head)))
    extensions.injectFunction((
      FunctionIdentifier("graft_frequent"),
      new ExpressionInfo(
        classOf[graft.functions.FrequentItemsAgg].getName,
        null,
        "graft_frequent",
        "graft_frequent(item, capacity) - SpaceSaving heavy-hitters summary: " +
          "array<struct<item,cnt,err>> sorted (cnt desc, item asc); at most " +
          "capacity counters per state, true count in [cnt-err, cnt]",
        ""),
      graft.functions.FrequentItemsAgg.fromArguments _))
  }
}
