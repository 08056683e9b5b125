package graft.io.dsv2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector — the full custom-source extension stack
  * (TableProvider → Table → ScanBuilder → Scan/Batch → InputPartition →
  * PartitionReader) with BOTH planning-time pushdowns a real connector
  * implements:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): conjunctive id
  *    bounds (>, >=, <, <=, =) narrow the generated [lo, hi) range BEFORE
  *    partition planning, so a selective filter prunes work at the task
  *    level — fewer/smaller partitions, zero rows materialized then
  *    discarded. Fully-handled filters are consumed (not re-evaluated by
  *    Spark); anything else (e.g. a predicate on `cat`) is returned as a
  *    residual for Spark's post-scan filter — the split every production
  *    connector (JDBC, Delta, Iceberg) performs.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): only
  *    requested columns are generated — the DSv2 analog of parquet's
  *    ReadSchema pruning.
  *  - **Aggregate pushdown** ([[SupportsPushDownAggregates]]): ungrouped
  *    COUNT(*)/MIN(id)/MAX(id) are answered COMPLETELY from range
  *    arithmetic — one metadata row, zero generated rows (the move a
  *    warehouse connector makes with table statistics). Grouped or
  *    derived-column aggregates are declined and computed by Spark.
  *  - **Limit pushdown** ([[SupportsPushDownLimit]]): the relation is
  *    unordered, so LIMIT n caps the generated range exactly.
  *  - **Reported statistics** ([[SupportsReportStatistics]]): row count
  *    and byte size of the POST-pushdown range, so Catalyst's broadcast
  *    decisions see the narrowed relation, not the nominal table.
  *
  * The table itself is a deterministic synthetic relation (the DSv2 analog
  * of `range()` with derived columns), so the gate can replicate it exactly
  * in DuckDB:
  *   id    BIGINT  0..rows-1
  *   val   BIGINT  (id * 2654435761) % 1000000   (Knuth multiplicative hash)
  *   cat   STRING  'c' || (id % 7)
  *   score DOUBLE  (val % 1000) / 10.0
  *
  * Scale posture: generation is embarrassingly parallel over `slices`
  * contiguous id ranges (option, default 8 — stands in for a real source's
  * split planning); an empty post-pushdown range plans ZERO partitions
  * (no tasks launched). At 100 TB the same shape holds: the source hands
  * Spark only the splits that survive predicate analysis, which is
  * exactly how partition pruning over object-store layouts works.
  *
  * Usage: `spark.read.format("graft.io.dsv2.SyntheticSource")
  *   .option("rows", n).option("slices", k).load()`.
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.fullSchema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.asScala.getOrElse("rows", "1000").toLong,
      properties.asScala.getOrElse("slices", "8").toInt)
}

object SyntheticSource {
  val fullSchema: StructType = new StructType()
    .add("id", LongType, nullable = false)
    .add("val", LongType, nullable = false)
    .add("cat", StringType, nullable = false)
    .add("score", DoubleType, nullable = false)

  /** One definition of the derived-column math, shared by the reader and
    * the tests (and mirrored in q_dsv2's DuckDB oracle SQL). */
  def valOf(id: Long): Long = (id * 2654435761L) % 1000000L
  def catOf(id: Long): String = "c" + (id % 7)
  def scoreOf(id: Long): Double = (valOf(id) % 1000L) / 10.0
}

class SyntheticTable(rows: Long, slices: Int) extends Table with SupportsRead {
  require(rows >= 0 && slices >= 1, s"need rows >= 0 and slices >= 1, got rows=$rows slices=$slices")
  override def name(): String = s"synthetic(rows=$rows)"
  override def schema(): StructType = SyntheticSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, slices)
}

class SyntheticScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var lo: Long = 0L
  private var hi: Long = rows // exclusive
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SyntheticSource.fullSchema
  private var aggs: Option[Seq[AggregateFunc]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case IsNotNull("id") => true // id is non-null by construction
      case _ => false
    }
    accepted = handled
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // COUNT(*), MIN(id), MAX(id) over the whole (post-filter) relation are
  // pure range arithmetic: count = hi−lo, min = lo, max = hi−1. COMPLETE
  // pushdown — the scan answers with one row and ZERO generated rows, the
  // same trick a warehouse connector plays with its table metadata.
  // Grouped aggregates and aggregates over derived columns are declined
  // (return false → Spark computes them from the scanned rows as usual).
  private def supported(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.forall {
      case _: CountStar => true
      case m: Min => m.column match {
        case nr: NamedReference => nr.fieldNames.toSeq == Seq("id")
        case _ => false
      }
      case m: Max => m.column match {
        case nr: NamedReference => nr.fieldNames.toSeq == Seq("id")
        case _ => false
      }
      case _ => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean = supported(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    if (!supported(agg)) return false
    aggs = Some(agg.aggregateExpressions.toSeq)
    true
  }

  // LIMIT pushdown: the relation is unordered, so "any n rows" is exact —
  // cap the generated range. Fully pushed (Spark still applies its own
  // final limit over the ≤ n returned rows, which is then a no-op).
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true
  }

  override def build(): Scan = SyntheticScan(lo, math.max(lo, hi), slices, required, aggs)
}

case class SyntheticScan(
    lo: Long, hi: Long, slices: Int, required: StructType,
    aggs: Option[Seq[AggregateFunc]])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = aggs match {
    case None => required
    case Some(fns) =>
      fns.zipWithIndex.foldLeft(new StructType()) {
        case (st, (_: CountStar, i)) => st.add(s"agg_$i", LongType, nullable = false)
        case (st, (_, i)) => st.add(s"agg_$i", LongType, nullable = true)
      }
  }

  override def toBatch: Batch = this

  override def description(): String = {
    val what = aggs.map(fns => s" agg=[${fns.mkString(",")}]").getOrElse("")
    s"graft-synthetic range=[$lo,$hi) cols=[${required.fieldNames.mkString(",")}]$what"
  }

  // Post-pushdown stats: Catalyst's join planning (broadcast-threshold
  // decisions) sees the NARROWED range, not the nominal table size.
  override def estimateStatistics(): Statistics = new Statistics {
    private val n = math.max(0L, hi - lo)
    private val rowBytes = readSchema().fields.map(_.dataType.defaultSize).sum
    override def sizeInBytes(): util.OptionalLong = util.OptionalLong.of(n * rowBytes)
    override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (aggs.isDefined) return Array(SyntheticAggPartition(lo, hi))
    val n = hi - lo
    if (n <= 0) return Array.empty
    val per = math.max(1L, (n + slices - 1) / slices)
    (lo until hi by per).map(s => SyntheticRange(s, math.min(hi, s + per)): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = aggs match {
    case None => new SyntheticReaderFactory(required.fieldNames)
    case Some(fns) =>
      // AggregateFunc is not Serializable-friendly; ship a compact tag.
      new SyntheticAggReaderFactory(fns.map {
        case _: CountStar => 'c'
        case _: Min => 'n'
        case _: Max => 'x'
      }.toArray)
  }
}

case class SyntheticRange(start: Long, end: Long) extends InputPartition
case class SyntheticAggPartition(lo: Long, hi: Long) extends InputPartition

/** Answers a completely-pushed aggregation with one computed row. */
class SyntheticAggReaderFactory(tags: Array[Char]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SyntheticAggPartition(lo, hi) = partition: @unchecked
    val empty = hi <= lo
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = { val r = !done; done = true; r }
      override def get(): InternalRow =
        new GenericInternalRow(tags.map[Any] {
          case 'c' => math.max(0L, hi - lo)
          case 'n' => if (empty) null else lo
          case 'x' => if (empty) null else hi - 1
        })
      override def close(): Unit = ()
    }
  }
}


/** Serialized to executors: holds only the pruned column names. */
class SyntheticReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SyntheticRange(start, end) = partition: @unchecked
    new PartitionReader[InternalRow] {
      private var id = start - 1
      override def next(): Boolean = { id += 1; id < end }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map[Any] {
          case "id" => id
          case "val" => SyntheticSource.valOf(id)
          case "cat" => UTF8String.fromString(SyntheticSource.catOf(id))
          case "score" => SyntheticSource.scoreOf(id)
        })
      override def close(): Unit = ()
    }
  }
}
