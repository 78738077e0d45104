package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{DataType, LongType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A DataSource V2 catalog plugin — the surface that makes connector
  * tables FIRST-CLASS SQL citizens (`CREATE TABLE graft_cat.ns.t …`,
  * `SELECT … FROM graft_cat.ns.t`) instead of `spark.read.format`
  * call sites. Registered with
  * `spark.sql.catalog.graft_cat=graft.sources.GraftCatalog`; this is
  * the same plug-in seam Iceberg/Delta catalogs use, so every pushdown
  * the RangeSource ScanBuilder implements (filters, pruning,
  * aggregates, limit/TopN, runtime filtering, SPJ partitioning, stats)
  * flows through catalog-resolved tables unchanged.
  *
  * Tables are interval definitions (`start`/`end`/`slices` table
  * properties), held in a per-catalog-instance registry — metadata
  * only; there is no data to manage, which is exactly the point: a V2
  * catalog maps names to `Table` handles, Spark does the rest.
  *
  * Also a [[FunctionCatalog]]: `residue16(x)` is a bound V2
  * ScalarFunction with the MAGIC static `invoke(Long)` — Catalyst
  * compiles the call to a static invocation (no row boxing), the
  * codegen-friendly path for catalog UDFs.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog
    with SupportsNamespaces with FunctionCatalog {

  private var catalogName: String = _
  private val tables = new ConcurrentHashMap[Identifier, RangeTable]()
  private val namespaces = ConcurrentHashMap.newKeySet[String]()

  override def initialize(
      name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    namespaces.add("ns") // a default namespace, always present
  }

  override def name(): String = catalogName

  // --- TableCatalog -------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    tables.keySet.asScala
      .filter(_.namespace.sameElements(namespace)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val t = tables.get(ident)
    if (t == null) throw new NoSuchTableException(ident)
    t
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    requireNamespace(ident.namespace)
    if (tables.containsKey(ident)) throw new TableAlreadyExistsException(ident)
    // Every table this catalog serves has the fixed range schema and
    // no partitioning — a declaration that disagrees must FAIL here,
    // not silently succeed and then serve different columns than the
    // user declared. (An empty column list is allowed: the catalog
    // fills in its schema, the usual CTAS-less "USING provider" form.)
    if (partitions.nonEmpty)
      throw new UnsupportedOperationException(
        s"GraftCatalog tables are unpartitioned; got PARTITIONED BY " +
          partitions.mkString(", "))
    // names + types only: SQL-declared columns parse as nullable while
    // the served schema is non-null — nullability is the catalog's call
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType))
    if (schema.nonEmpty && shape(schema) != shape(RangeSource.schema))
      throw new IllegalArgumentException(
        s"GraftCatalog tables have the fixed schema " +
          s"${RangeSource.schema.simpleString}; declared ${schema.simpleString}")
    val t = new RangeTable(
      Option(properties.get("start")).map(_.toLong).getOrElse(0L),
      Option(properties.get("end")).map(_.toLong).getOrElse(0L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(4))
    tables.put(ident, t)
    t
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val cur = loadTable(ident).asInstanceOf[RangeTable]
    val props = new util.HashMap[String, String]()
    changes.foreach {
      case p: TableChange.SetProperty => props.put(p.property, p.value)
      case other => throw new UnsupportedOperationException(
        s"GraftCatalog only supports SET TBLPROPERTIES, got $other")
    }
    val next = new RangeTable(
      Option(props.get("start")).map(_.toLong).getOrElse(cur.start),
      Option(props.get("end")).map(_.toLong).getOrElse(cur.end),
      Option(props.get("slices")).map(_.toInt).getOrElse(cur.slices))
    tables.put(ident, next)
    next
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(ident) != null

  override def renameTable(from: Identifier, to: Identifier): Unit = {
    val t = tables.remove(from)
    if (t == null) throw new NoSuchTableException(from)
    if (tables.putIfAbsent(to, t) != null) {
      tables.put(from, t)
      throw new TableAlreadyExistsException(to)
    }
  }

  // --- SupportsNamespaces --------------------------------------------

  private def requireNamespace(ns: Array[String]): Unit =
    if (!namespaceExists(ns)) {
      throw new NoSuchNamespaceException(ns)
    }

  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && namespaces.contains(ns(0))

  override def listNamespaces(): Array[Array[String]] =
    namespaces.asScala.toArray.sorted.map(Array(_))

  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    requireNamespace(ns)
    Array.empty // single-level namespaces only
  }

  override def loadNamespaceMetadata(
      ns: Array[String]): util.Map[String, String] = {
    requireNamespace(ns)
    util.Collections.emptyMap()
  }

  override def createNamespace(
      ns: Array[String], metadata: util.Map[String, String]): Unit = {
    require(ns.length == 1, "GraftCatalog namespaces are single-level")
    namespaces.add(ns(0))
  }

  override def alterNamespace(
      ns: Array[String], changes: NamespaceChange*): Unit =
    requireNamespace(ns)

  override def dropNamespace(
      ns: Array[String], cascade: Boolean): Boolean = {
    requireNamespace(ns)
    if (!cascade && tables.keySet.asScala.exists(_.namespace.sameElements(ns)))
      throw new IllegalStateException(s"namespace ${ns.mkString(".")} not empty")
    tables.keySet.asScala.filter(_.namespace.sameElements(ns))
      .foreach(tables.remove)
    namespaces.remove(ns(0))
  }

  // --- FunctionCatalog ------------------------------------------------

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    requireNamespace(namespace)
    Array(Identifier.of(namespace, "residue16"),
      Identifier.of(namespace, "xor_digest"))
  }

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name == "residue16") GraftCatalog.Residue16Unbound
    else if (ident.name == "xor_digest") GraftCatalog.XorDigestUnbound
    else throw new NoSuchFunctionException(ident)
}

object GraftCatalog {

  /** `residue16(x)` = floorMod(x, 16) — the table's bucketing function
    * published through the catalog, so SQL can group/join on exactly
    * the layout key the SPJ partitions use.
    */
  object Residue16Unbound extends UnboundFunction {
    override def name(): String = "residue16"
    override def description(): String =
      "residue16(x BIGINT) -> BIGINT: floorMod(x, 16), the range table's bucket"
    override def bind(inputType: StructType): BoundFunction = {
      // bind() sees the RAW argument type; declaring LongType in
      // inputTypes() makes Spark insert the integral widening cast, so
      // accept any integral argument here
      import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
      val ok = inputType.fields.length == 1 &&
        Set[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(inputType.fields(0).dataType)
      require(ok, s"residue16 takes one integral argument, got $inputType")
      Residue16
    }
  }

  /** `xor_digest(x)` — the V2 AGGREGATE function leg of the catalog
    * ladder (`connector.catalog.functions.AggregateFunction`): the
    * catalog publishes not just scalar compute but a full mergeable
    * aggregation Spark plans with partial/merge stages like any
    * builtin — `update` runs map-side per partition, `merge` combines
    * partial states across the exchange, so the shuffle carries ONE
    * 8-byte state per group per partition regardless of row count.
    * XOR is the repo's order-independent digest primitive (the
    * ChecksumSink commit protocol, the fingerprint gates), and its
    * DuckDB twin `bit_xor` makes the leg oracle-checkable end to end.
    * NULLs are ignored (aggregate convention); empty input → 0.
    */
  object XorDigestUnbound extends UnboundFunction {
    override def name(): String = "xor_digest"
    override def description(): String =
      "xor_digest(x BIGINT) -> BIGINT: XOR of all non-null inputs (order-independent digest)"
    override def bind(inputType: StructType): BoundFunction = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
      val ok = inputType.fields.length == 1 &&
        Set[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(inputType.fields(0).dataType)
      require(ok, s"xor_digest takes one integral argument, got $inputType")
      XorDigest
    }
  }

  object XorDigest
      extends org.apache.spark.sql.connector.catalog.functions
        .AggregateFunction[java.lang.Long, java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "xor_digest"
    override def canonicalName(): String = "graft.xor_digest"
    override def isResultNullable: Boolean = false
    override def newAggregationState(): java.lang.Long = 0L
    override def update(
        state: java.lang.Long,
        input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
      if (input.isNullAt(0)) state
      else java.lang.Long.valueOf(state.longValue ^ input.getLong(0))
    override def merge(s1: java.lang.Long, s2: java.lang.Long): java.lang.Long =
      java.lang.Long.valueOf(s1.longValue ^ s2.longValue)
    override def produceResult(state: java.lang.Long): java.lang.Long = state
  }

  object Residue16 extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(LongType)
    override def resultType(): DataType = LongType
    override def name(): String = "residue16"
    override def canonicalName(): String = "graft.residue16"
    override def isResultNullable: Boolean = false
    // the MAGIC method: Catalyst compiles the call to a static-shaped
    // Invoke on this signature — no InternalRow boxing on the hot path
    def invoke(x: Long): Long = java.lang.Math.floorMod(x, 16L)
    // interpreted fallback
    override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
      java.lang.Math.floorMod(input.getLong(0), 16L)
  }
}
