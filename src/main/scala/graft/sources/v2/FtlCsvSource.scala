package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSourceV2 connector for FTL CSV exports — the reference's scan
  * contract (projection of the 7 engine columns + half-open timestamp
  * range, db.py:130-135) implemented AT THE SOURCE instead of above it.
  *
  * `spark.read.format("ftl-csv").load(path)` yields the typed relation,
  * and the connector implements the two DSv2 pushdown hooks that matter
  * at 100 TB:
  *   - [[SupportsPushDownRequiredColumns]]: only requested columns are
  *     PARSED — a `select(count(*))` never materializes a domain string;
  *   - [[SupportsPushDownFilters]]: timestamp range comparisons are
  *     evaluated during the scan, before rows exist as InternalRows —
  *     `.explain` shows them under `PushedFilters`, and Spark re-applies
  *     nothing (they are reported as fully handled).
  *
  * One InputPartition per file: FTL exports are per-database files, the
  * same natural parallelism the multi-DB union has. Malformed lines are
  * SKIPPED (counted per-partition to executor logs) — the quarantining
  * ingest path is `FtlIngest.readCsvSplit`; this source is the
  * pushdown-optimal fast path for clean exports.
  *
  * Kept deliberately to the stable public `connector.*` API — no
  * FileFormat internals — so it doubles as the template for wrapping any
  * custom format (the multimodal lake case: media container files with
  * metadata pushdown). */
class FtlCsvSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "ftl-csv"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    graft.sources.FtlIngest.SourceSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new FtlCsvTable(paths(new CaseInsensitiveStringMap(properties)))

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    // spark.read.load(p) → "path"; load(p1, p2, ...) → "paths" (JSON array)
    val multi = Option(options.get("paths")).map { js =>
      js.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    val all = (single ++ multi).filter(_.nonEmpty)
    require(all.nonEmpty, "ftl-csv: no path given (use .load(path))")
    all
  }
}

private[v2] class FtlCsvTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"ftl_csv(${paths.mkString(",")})"
  override def schema(): StructType = graft.sources.FtlIngest.SourceSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FtlCsvScanBuilder(paths)
}

private[v2] class FtlCsvScanBuilder(paths: Seq[String]) extends ScanBuilder
  with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private val fullSchema = graft.sources.FtlIngest.SourceSchema
  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[sources.Filter] = Array.empty

  /** Timestamp range comparisons are evaluated inside the parse loop —
    * fully handled here, so they are NOT returned as post-scan filters. */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (supported, rest) = filters.partition {
      case sources.GreaterThanOrEqual("timestamp", _: Long) => true
      case sources.GreaterThan("timestamp", _: Long) => true
      case sources.LessThanOrEqual("timestamp", _: Long) => true
      case sources.LessThan("timestamp", _: Long) => true
      case sources.EqualTo("timestamp", _: Long) => true
      case _ => false
    }
    pushed = supported
    rest
  }

  override def pushedFilters(): Array[sources.Filter] = pushed

  override def pruneColumns(required: StructType): Unit = {
    // preserve source column order regardless of the requested order
    val names = required.fieldNames.toSet
    requiredSchema = StructType(fullSchema.fields.filter(f => names.contains(f.name)))
  }

  override def build(): Scan = new FtlCsvScan(paths, requiredSchema, pushed)
}

private[v2] class FtlCsvScan(paths: Seq[String], required: StructType,
                             filters: Array[sources.Filter]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"ftl-csv PushedFilters: [${filters.mkString(", ")}], ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => FtlCsvPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new FtlCsvReaderFactory(required.fieldNames, filters)
}

private[v2] case class FtlCsvPartition(path: String) extends InputPartition

private[v2] class FtlCsvReaderFactory(columns: Array[String],
                                      filters: Array[sources.Filter])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FtlCsvReader(partition.asInstanceOf[FtlCsvPartition].path, columns, filters)
}

/** Line-at-a-time reader: parses ONLY the pruned columns (plus timestamp
  * when a range filter needs it), applies the pushed range before
  * emitting, skips malformed lines. FTL exports have no quoted commas
  * (domains/IPs cannot contain them), so the split is a plain comma. */
private[v2] class FtlCsvReader(path: String, columns: Array[String],
                               filters: Array[sources.Filter])
  extends PartitionReader[InternalRow] {

  private val allCols =
    graft.sources.FtlIngest.SourceSchema.fieldNames.zipWithIndex.toMap
  private val outIdx = columns.map(allCols)
  private val tsIdx = allCols("timestamp")

  private val tsPred: Long => Boolean = {
    val preds = filters.map[Long => Boolean] {
      case sources.GreaterThanOrEqual(_, v: Long) => _ >= v
      case sources.GreaterThan(_, v: Long) => _ > v
      case sources.LessThanOrEqual(_, v: Long) => _ <= v
      case sources.LessThan(_, v: Long) => _ < v
      case sources.EqualTo(_, v: Long) => _ == v
      case f => throw new IllegalStateException(s"unexpected pushed filter $f")
    }
    ts => preds.forall(_(ts))
  }

  private val lines = scala.io.Source.fromFile(path, "UTF-8")
  private val it = lines.getLines().drop(1) // header
  private var current: InternalRow = _
  private var skipped = 0L

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val parts = it.next().split(",", -1)
      if (parts.length == allCols.size) {
        try {
          val ts = parts(tsIdx).toLong
          if (tsPred(ts)) {
            val values = outIdx.map { i =>
              val raw = parts(i)
              i match {
                case 0 => raw.toInt: Any // id
                case 1 => raw.toLong: Any // timestamp
                case 2 | 3 => raw.toByte: Any // type, status
                case 4 | 5 => UTF8String.fromString(raw): Any // domain, client
                case 6 => if (raw.isEmpty) null else raw.toDouble: Any // reply_time
              }
            }
            current = InternalRow.fromSeq(values.toIndexedSeq)
          }
        } catch { case _: NumberFormatException => skipped += 1 }
      } else skipped += 1
    }
    current != null
  }

  override def get(): InternalRow = current

  override def close(): Unit = {
    if (skipped > 0)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"ftl-csv: skipped $skipped malformed line(s) in $path")
    lines.close()
  }
}
