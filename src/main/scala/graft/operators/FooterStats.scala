package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.SparkSession

/** Parquet footer metadata reads — the scan-avoidance primitives behind
  * q182 and the engine's COUNT(*) fast path. Row counts live in every
  * footer (mandatory per the format), so a count is exact without
  * touching a data page; at 100 TB that is KBs of footer per file
  * instead of the corpus.
  *
  * Driver-side listing + footer loop below a file-count threshold
  * (the register-time case: one footer per table at test scale, and a
  * footer read is one ranged read of the file tail); the distributed
  * q182 path (SourceOps.footerStats) takes over where a table has
  * enough files that a driver loop would serialize the metadata I/O. */
object FooterStats {

  /** Leaf parquet files of `path` — a single file or a directory of
    * part files (Spark/Hive layout). Storage-agnostic via the Hadoop
    * FileSystem API. */
  def parquetFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.getFileStatus(root).isDirectory)
      fs.listStatus(root).toSeq
        .filter(st => st.isFile && {
          val n = st.getPath.getName
          n.endsWith(".parquet") || n.startsWith("part-")
        })
        .map(_.getPath.toString).sorted
    else Seq(root.toString)
  }

  /** Exact row count of one parquet file from its footer. */
  def fileRows(p: String, conf: Configuration): Long = {
    val in = HadoopInputFile.fromPath(new Path(p), conf)
    val r = ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      r.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    } finally r.close()
  }

  /** Exact table row count from footers only: driver loop up to
    * `distributeAbove` files, a distributed footer job beyond (the
    * ~1M-file case — metadata I/O scales out with the executors). */
  def rowCount(spark: SparkSession, path: String,
      distributeAbove: Int = 64): Long = {
    val files = parquetFiles(spark, path)
    if (files.size <= distributeAbove) {
      val conf = spark.sparkContext.hadoopConfiguration
      files.map(fileRows(_, conf)).sum
    } else {
      import spark.implicits._
      spark.createDataset(files)
        .repartition(math.min(files.size, 256))
        .mapPartitions { it =>
          val conf = new Configuration()
          it.map(fileRows(_, conf))
        }.reduce(_ + _)
    }
  }
}
