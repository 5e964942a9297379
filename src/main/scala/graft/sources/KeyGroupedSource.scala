package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 connector that REPORTS ITS KEY-GROUPED LAYOUT to the
  * planner — `format("graft-kg")` — the storage-partitioned-join (SPJ)
  * machinery a modern lake source (Iceberg, Delta with liquid
  * clustering) uses to make big-big joins exchange-free at read time.
  *
  * The v1 analog is q278's bucketed-table join; this is the DSv2 form:
  * the layout on disk is one directory per key value (Spark's own
  * `partitionBy` hive-style layout, `dir/key=value/part-*`), each scan
  * partition carries its key via [[HasPartitionKey]], and the scan
  * reports [[KeyGroupedPartitioning]] over `identity(key)`. With
  * `spark.sql.sources.v2.bucketing.enabled` the planner groups the
  * partitions by key, recognizes the two sides as co-partitioned, and
  * plans the join with NO shuffle below it — at 100 TB the difference
  * between moving both datasets and moving nothing.
  *
  * The payload format is deliberately trivial (tab-separated lines,
  * long/string columns only, no quoting — the writer refuses data that
  * would need it): the mechanism under test is the PARTITIONING
  * CONTRACT between the source and the planner, not a file format.
  * Files are read through the local filesystem like GeoNetSource's
  * `path` mode; a production source would stack Hadoop FS + a real
  * format behind the same `planInputPartitions`/`partitionKey` seam.
  *
  * Options: `path` (layout root), `schema` (DDL, key column included),
  * `key` (the partition-key column, must be a STRING field of schema).
  */
class KeyGroupedTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-kg"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType.fromDDL(Option(options.get("schema")).getOrElse(
      throw new IllegalArgumentException(
        "graft-kg requires a 'schema' option (DDL)")))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KeyGroupedTable(new CaseInsensitiveStringMap(properties))
}

final class KeyGroupedTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead {
  private val schemaDdl = Option(options.get("schema")).getOrElse(
    throw new IllegalArgumentException("graft-kg requires 'schema'"))
  private val key = Option(options.get("key")).getOrElse(
    throw new IllegalArgumentException("graft-kg requires 'key'"))
  private val path = Option(options.get("path")).getOrElse(
    throw new IllegalArgumentException("graft-kg requires 'path'"))
  override def name(): String = s"graft-kg($path)"
  override def schema(): StructType = StructType.fromDDL(schemaDdl)
  // the layout IS key-partitioned — report it at the table level too
  // (catalog-style metadata; the planner's SPJ decision reads the
  // SCAN's report below)
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity(key))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new KeyGroupedScan(path, schema(), key)
}

final class KeyGroupedScan(rawPath: String, schema: StructType, key: String)
    extends Scan with Batch with SupportsReportPartitioning {

  private val path = KeyGroupedLayout.localPath(rawPath)

  require(schema.fieldNames.contains(key),
    s"key '$key' not in schema ${schema.catalogString}")
  require(schema(key).dataType == StringType,
    s"graft-kg partition key must be STRING, got ${schema(key).dataType}")

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"KeyGroupedScan(path=$path, key=$key)"

  /** One partition per data file under `key=value/`; the key rides on
    * the partition ([[HasPartitionKey]]) so the planner can group
    * same-key files into one key-partition. `lazy`: planInputPartitions
    * may be called more than once per query.
    */
  private lazy val partitions: Array[InputPartition] = {
    val root = new java.io.File(path)
    require(root.isDirectory, s"graft-kg path $path is not a directory")
    val prefix = key + "="
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .sortBy(_.getName)
      .flatMap { dir =>
        val value = dir.getName.substring(prefix.length)
        dir.listFiles()
          .filter(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".") && f.length() > 0)
          .sortBy(_.getName)
          .map(f => KgInputPartition(f.getAbsolutePath, value): InputPartition)
      }
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  /** The SPJ contract: numPartitions MUST equal planInputPartitions's
    * length (Spark validates), and the clustering expression names the
    * key column of [[readSchema]].
    */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity(key)),
      partitions.length)

  override def createReaderFactory(): PartitionReaderFactory =
    new KgReaderFactory(schema, key)
}

final case class KgInputPartition(filePath: String, keyValue: String)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    InternalRow(UTF8String.fromString(keyValue))
}

/** Parses tab-separated lines into the declared schema; the key column
  * comes from the partition directory name, the remaining columns from
  * the file in schema order (the writer's column order).
  */
final class KgReaderFactory(schema: StructType, key: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val kp = p.asInstanceOf[KgInputPartition]
    val dataFields = schema.fields.filterNot(_.name == key)
    val keyIdx = schema.fieldIndex(key)
    new PartitionReader[InternalRow] {
      private val reader = new java.io.BufferedReader(new java.io.FileReader(
        kp.filePath, java.nio.charset.StandardCharsets.UTF_8))
      private var line: String = _
      override def next(): Boolean = {
        line = reader.readLine()
        line != null
      }
      override def get(): InternalRow = {
        val parts = line.split('\t')
        require(parts.length == dataFields.length,
          s"expected ${dataFields.length} fields, got ${parts.length} " +
            s"in ${kp.filePath}")
        val values = new Array[Any](schema.length)
        values(keyIdx) = UTF8String.fromString(kp.keyValue)
        var i = 0
        var j = 0
        while (i < schema.length) {
          if (i != keyIdx) {
            values(i) = dataFields(j).dataType match {
              case LongType => parts(j).toLong
              case StringType => UTF8String.fromString(parts(j))
              case dt => throw new IllegalArgumentException(
                s"graft-kg supports BIGINT/STRING columns, got $dt")
            }
            j += 1
          }
          i += 1
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = reader.close()
    }
  }
}

object KeyGroupedLayout {
  /** Local filesystem path for `p`, with any `file:` URI scheme
    * stripped — warehouse-derived dirs arrive as `file:/...` URIs,
    * and a raw java.io.File of that string would create a literal
    * "file:" directory relative to the cwd.
    */
  private[sources] def localPath(p: String): String =
    if (p.startsWith("file:")) new java.net.URI(p).getPath else p

  /** Writes `df` as the graft-kg layout: `dir/key=value/part-0.tsv`,
    * tab-separated, non-key columns in schema order. DISTRIBUTED per
    * key (Spark repartitions by the key and each task writes its own
    * key-directories) — the driver never materializes the data; at
    * 100 TB this is `df.write.partitionBy(key)` with a trivial format.
    * Refuses strings containing tabs/newlines rather than quoting —
    * the format is a partitioning-contract fixture, not a codec.
    */
  def write(df: org.apache.spark.sql.DataFrame, key: String,
      rawDir: String): Unit = {
    val dir = localPath(rawDir)
    val schema = df.schema
    val keyIdx = schema.fieldIndex(key)
    val dataIdx = schema.fields.zipWithIndex.filter(_._1.name != key)
      .map(_._2)
    new java.io.File(dir).mkdirs()
    df.repartition(org.apache.spark.sql.functions.col(key))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val writers = scala.collection.mutable.Map[String, java.io.Writer]()
        val pid = org.apache.spark.TaskContext.getPartitionId()
        try {
          it.foreach { row =>
            val k = row.getString(keyIdx)
            require(!k.contains('/') && !k.contains('='),
              s"graft-kg key value '$k' not layout-safe")
            val w = writers.getOrElseUpdate(k, {
              val d = new java.io.File(dir, s"$key=$k")
              d.mkdirs()
              new java.io.BufferedWriter(new java.io.FileWriter(
                new java.io.File(d, f"part-$pid%05d.tsv"),
                java.nio.charset.StandardCharsets.UTF_8))
            })
            val fields = dataIdx.map { i =>
              val v = row.get(i)
              val s = String.valueOf(v)
              require(!s.contains('\t') && !s.contains('\n'),
                s"graft-kg field value needs quoting (unsupported): $s")
              s
            }
            w.write(fields.mkString("\t"))
            w.write('\n')
          }
        } finally writers.values.foreach(_.close())
      }
  }
}
