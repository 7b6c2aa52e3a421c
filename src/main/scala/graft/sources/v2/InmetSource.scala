package graft.sources.v2

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the INMET station-CSV micro-format — the engine
  * reads the reference's raw input as a FIRST-CLASS table:
  * `spark.read.format("graft.sources.v2.InmetSource").load(glob)`.
  *
  * The raw file is not a CSV: an 8-line `KEY:;VALUE` metadata section,
  * then a header row naming the hourly columns, then `;`-separated data
  * rows with decimal commas, dual date formats, and a trailing-`;` ghost
  * column (see SURVEY.md §1.3). The reader mirrors graft.inmet.Ingest's
  * semantics exactly: per-file column-index detection from the sanitized
  * header, day-first-tolerant date parse (unparseable → row dropped),
  * strict-numeral decimal-comma doubles (else null → zero-fill).
  *
  * Scale design: one input partition per file (station files are
  * independent; a 10k-station estate reads with 10k-way parallelism and
  * no shuffle), column PRUNING via SupportsPushDownRequiredColumns (a
  * `select(wmo)` never parses the other 5 measures), and filter
  * PUSHDOWN via SupportsPushDownFilters on `data_medicao` bounds and
  * `wmo` equality — a time-scoped query skips non-matching rows inside
  * the scan, and a wmo-pinned query short-circuits whole files right
  * after their metadata section. NOTE the DSv2 contract: filters this
  * builder ACCEPTS (returns from pushFilters as handled) are trusted and
  * NOT re-evaluated by Spark above the scan — the reader's bound/equality
  * application is load-bearing, which is why pushFilters only accepts
  * date filters whose literal is a Date/LocalDate it knows how to apply
  * and hands everything else back for post-scan evaluation. */
class InmetSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    InmetSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new InmetTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

/** Hadoop `Configuration` is not serializable; this minimal wrapper ships
  * the SESSION's conf (credentials, custom filesystem schemes) from the
  * driver-side scan to executor-side readers instead of each site
  * rebuilding a default `new Configuration()` that drops user settings. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object InmetSource {
  /** The active session's hadoop conf on the driver; default conf when
    * called outside a session (tests constructing readers directly). */
  def sessionHadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  val schema: StructType = StructType(Seq(
    StructField("wmo", StringType),
    StructField("data_medicao", DateType),
    StructField("precipitacao_mm", DoubleType),
    StructField("pressao_atm_kpa", DoubleType),
    StructField("temperatura_c", DoubleType),
    StructField("umidade_porcentagem", DoubleType),
    StructField("vento_mps", DoubleType)))

  /** JVM twin of Ingest.commaDouble: strict-numeral decimal-comma parse;
    * anything else null (callers zero-fill). */
  def commaDouble(raw: String): Option[Double] = {
    val dotted = raw.trim.replace(',', '.')
    val residue = dotted.filterNot(_.isDigit)
    if (residue == "" || residue == "." || residue == "-" || residue == "-.")
      try Some(dotted.toDouble) catch { case _: NumberFormatException => None }
    else None
  }

  /** JVM twin of Ingest.parseDateFlexible (shape-dispatched formats,
    * unparseable → None). Returns days since epoch. */
  def parseDate(raw: String): Option[Int] = {
    val t = raw.trim
    val fmt =
      if (t.matches("^\\d{4}/\\d{2}/\\d{2}$")) Some("yyyy/MM/dd")
      else if (t.matches("^\\d{2}/\\d{2}/\\d{4}$")) Some("dd/MM/yyyy")
      else if (t.matches("^\\d{2}/\\d{2}/\\d{2}$")) Some("dd/MM/yy")
      else None
    fmt.flatMap { f =>
      try Some(java.time.LocalDate.parse(t,
        java.time.format.DateTimeFormatter.ofPattern(f)).toEpochDay.toInt)
      catch { case _: java.time.format.DateTimeParseException => None }
    }
  }
}

class InmetTable(pathGlob: String) extends Table with SupportsRead {
  override def name(): String = s"inmet(`$pathGlob`)"
  override def schema(): StructType = InmetSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new InmetScanBuilder(pathGlob)
}

class InmetScanBuilder(pathGlob: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = InmetSource.schema
  private var pushed: Array[Filter] = Array.empty

  // accepted filters are NOT re-evaluated by Spark — only claim values
  // the reader can apply exactly (Date/LocalDate literals); anything else
  // is handed back so Spark evaluates it post-scan instead of the reader
  // failing at runtime on an unanticipated literal type
  private def isDateLit(v: Any): Boolean = v match {
    case _: java.sql.Date | _: java.time.LocalDate => true
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("wmo", _: String) => true
      case EqualTo("data_medicao", v) => isDateLit(v)
      case GreaterThan("data_medicao", v) => isDateLit(v)
      case GreaterThanOrEqual("data_medicao", v) => isDateLit(v)
      case LessThan("data_medicao", v) => isDateLit(v)
      case LessThanOrEqual("data_medicao", v) => isDateLit(v)
      case _ => false
    }
    pushed = accepted
    rejected // Spark evaluates these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new InmetScan(pathGlob, required, pushed)
}

class InmetScan(pathGlob: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {
  // captured ON THE DRIVER at scan-build time: the session's hadoop conf
  // (credentials, custom schemes), shipped serialized to every reader
  private val hconf = new SerializableHadoopConf(
    InmetSource.sessionHadoopConf())

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new InmetMicroBatchStream(pathGlob, required, pushed, hconf)
  override def description(): String =
    s"InmetScan ReadSchema: ${required.fieldNames.mkString("[", ",", "]")}, " +
      s"PushedFilters: ${pushed.mkString("[", ", ", "]")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(pathGlob)
    val fs = p.getFileSystem(hconf.value)
    val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
    matched.map(s => InmetPartition(s.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new InmetReaderFactory(required, pushed, hconf)
}

case class InmetPartition(path: String) extends InputPartition

/** File-count offset into the sorted discovery log. */
case class InmetOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

/** Micro-batch face of the same scan: `spark.readStream.format(...)`
  * serves the streaming ingest path through the identical per-file
  * reader — pruning and pushdown included, since the stream is built
  * from the already-negotiated ScanBuilder state.
  *
  * Offsets are FILE-granularity: the stream keeps a driver-side
  * discovery log (first glob sorted by path; later-appearing files
  * appended in sorted order at each `latestOffset` poll), and an offset
  * is a prefix length of that log. A batch (start, end] reads exactly
  * the files in log positions [start, end) — one input partition per
  * file, same as the batch scan, so a 10k-station estate still streams
  * with per-station parallelism. Station files are treated as immutable
  * once visible (the INMET estate is drop-complete-files). Recovery
  * contract: on restart the log is rebuilt by re-globbing, so a
  * checkpointed prefix is valid when the directory grew append-only in
  * sorted order — the same assumption file-granularity offsets imply
  * for any glob-discovery source without a per-file ledger. */
class InmetMicroBatchStream(pathGlob: String, required: StructType,
    pushed: Array[Filter], hconf: SerializableHadoopConf)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val log = new scala.collection.mutable.LinkedHashSet[String]

  private def refresh(): Unit = {
    val p = new Path(pathGlob)
    val fs = p.getFileSystem(hconf.value)
    val now = Option(fs.globStatus(p)).getOrElse(Array.empty)
      .map(_.getPath.toString).sorted
    now.foreach { f => if (!log.contains(f)) log += f }
  }

  override def initialOffset(): Offset = InmetOffset(0)
  override def latestOffset(): Offset = { refresh(); InmetOffset(log.size) }
  override def deserializeOffset(json: String): Offset =
    InmetOffset(json.trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[InmetOffset].n
    val e = end.asInstanceOf[InmetOffset].n
    if (log.size < e) refresh()
    log.iterator.slice(s, e)
      .map(f => InmetPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new InmetReaderFactory(required, pushed, hconf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class InmetReaderFactory(required: StructType, pushed: Array[Filter],
    hconf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new InmetReader(partition.asInstanceOf[InmetPartition].path, required,
      pushed, hconf)
}

/** Streams one station file: metadata → header indices → filtered,
  * pruned hourly rows. Only the REQUIRED measures are parsed per row. */
class InmetReader(path: String, required: StructType, pushed: Array[Filter],
    hconf: SerializableHadoopConf) extends PartitionReader[InternalRow] {
  import graft.inmet.Ingest.{measureRenames, sanitize}
  import InmetSource.{commaDouble, parseDate}

  private val p = new Path(path)
  private val in = p.getFileSystem(hconf.value).open(p)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))

  private var wmo: String = ""
  private var idx: Map[String, Int] = Map.empty // output col -> 0-based index
  private var headerSeen = false
  private var current: InternalRow = _
  private var fileDone = false

  private val dateLine = "^\\d{2,4}/\\d{2}/\\d{2,4};.*".r.pattern

  // pushed-filter bounds (days since epoch); wmo equality short-circuit
  private def days(v: Any): Int = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
    case d: java.time.LocalDate => d.toEpochDay.toInt
    case o => throw new IllegalArgumentException(s"date filter value $o")
  }
  private var loDays = Int.MinValue
  private var hiDays = Int.MaxValue
  private var wmoEq: Option[String] = None
  pushed.foreach {
    case EqualTo("wmo", s: String) => wmoEq = Some(s)
    case EqualTo("data_medicao", v) =>
      loDays = math.max(loDays, days(v)); hiDays = math.min(hiDays, days(v))
    case GreaterThan("data_medicao", v) => loDays = math.max(loDays, days(v) + 1)
    case GreaterThanOrEqual("data_medicao", v) => loDays = math.max(loDays, days(v))
    case LessThan("data_medicao", v) => hiDays = math.min(hiDays, days(v) - 1)
    case LessThanOrEqual("data_medicao", v) => hiDays = math.min(hiDays, days(v))
    case _ =>
  }

  override def next(): Boolean = {
    if (fileDone) return false
    var line = reader.readLine()
    while (line != null) {
      if (!headerSeen) {
        if (line.startsWith("Data;")) {
          val names = line.split(";", -1).map(sanitize)
          val pos = names.zipWithIndex.toMap
          idx = (("data_medicao" -> pos.get("data")) +:
            measureRenames.map { case (in0, out) => out -> pos.get(in0) })
            .collect { case (k, Some(i)) => k -> i }.toMap
          headerSeen = true
          // a wmo-pinned scan can drop the whole file here
          if (wmoEq.exists(_ != wmo)) { fileDone = true; return false }
        } else if (line.matches("^[^;]+:;.*")) {
          val k = line.substring(0, line.indexOf(":;")).trim.toLowerCase
          val v = line.substring(line.indexOf(":;") + 2).trim
          if (k == "codigo (wmo)") wmo = v
        }
      } else if (dateLine.matcher(line).matches()) {
        val c = line.split(";", -1)
        def at(col: String): Option[String] =
          idx.get(col).filter(_ < c.length).map(c(_))
        // rows with unparseable dates are DROPPED (reference semantics),
        // even when data_medicao is pruned away
        at("data_medicao").flatMap(parseDate) match {
          case Some(d) if d >= loDays && d <= hiDays =>
            val vals: Array[Any] = required.fieldNames.map {
              case "wmo" => UTF8String.fromString(wmo): Any
              case "data_medicao" => d: Any
              case m => at(m).flatMap(commaDouble).getOrElse(0.0): Any
            }
            current = new GenericInternalRow(vals)
            return true
          case _ =>
        }
      }
      line = reader.readLine()
    }
    fileDone = true
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
