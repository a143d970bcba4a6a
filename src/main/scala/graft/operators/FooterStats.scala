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

  /** Hadoop `Configuration` is not Java-serializable; wrap it with its
    * own write/readFields so the SESSION configuration (credentials,
    * filesystem bindings — the object-store essentials) rides into
    * executor closures. Same shape as Spark's internal
    * SerializableConfiguration, which is `private[spark]`. */
  private class SerHadoopConf(@transient var value: Configuration)
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

  /** Leaf parquet files of `path` — a single file, a directory of part
    * files, or a Hive-partitioned tree (`shard=0/part-…`, what this
    * repo's own partitionBy sink writes): the listing is RECURSIVE, so
    * nested layouts count their real files instead of silently listing
    * zero. Metadata entries (`_SUCCESS`, `_temporary`, `.crc`) are
    * skipped at any depth. Storage-agnostic via the Hadoop FileSystem
    * API. */
  def parquetFiles(spark: SparkSession, path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // listFiles returns fully-qualified paths (file:/…); the registered
    // root may be bare (/tmp/…). Qualify it the same way so the walk
    // below stops AT the root — comparing unqualified strings never
    // matches, and the walk would run past the root and flag any '.'/'_'
    // ancestor of the table itself (a table under ~/.cache) as hidden.
    val qroot = fs.makeQualified(root)
    def hiddenUnder(p: Path): Boolean = {
      // any segment strictly below the root starting with '.' or '_'
      // is writer metadata, not data
      var cur = p; var h = false
      while (cur != null && cur != qroot && !h) {
        val n = cur.getName
        h = n.startsWith(".") || n.startsWith("_")
        cur = cur.getParent
      }
      h
    }
    if (fs.getFileStatus(root).isDirectory) {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (st.isFile && !hiddenUnder(st.getPath) &&
            (n.endsWith(".parquet") || n.startsWith("part-")))
          buf += st.getPath.toString
      }
      buf.sorted.toSeq
    } else Seq(root.toString)
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

  /** Exact table row count from footers only, or None when the listing
    * finds no parquet files under `path` (an exotic layout the lister
    * does not understand — the caller must fall back to a scan count,
    * never report 0 rows for a table Spark can read). Driver loop up to
    * `distributeAbove` files, a distributed footer job beyond (the
    * ~1M-file case — metadata I/O scales out with the executors). */
  def rowCount(spark: SparkSession, path: String,
      distributeAbove: Int = 64): Option[Long] = {
    val files = parquetFiles(spark, path)
    if (files.isEmpty) None
    else if (files.size <= distributeAbove) {
      val conf = spark.sparkContext.hadoopConfiguration
      Some(files.map(fileRows(_, conf)).sum)
    } else Some {
      import spark.implicits._
      // ship the SESSION Hadoop configuration to the executors (the way
      // Spark's own file sources do): this branch exists for the
      // many-file object-store case, where credentials and filesystem
      // bindings live in that conf — a bare `new Configuration()` would
      // silently drop them and fail exactly at the advertised scale
      val bconf = spark.sparkContext.broadcast(
        new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
      spark.createDataset(files)
        .repartition(math.min(files.size, 256))
        .mapPartitions { it =>
          val conf = bconf.value.value
          it.map(fileRows(_, conf))
        }.reduce(_ + _)
    }
  }

  /** True iff this chunk's min/max statistics are exact under SIGNED
    * long interpretation: INT32/INT64 physical type whose logical
    * annotation is absent or signed — unsigned annotations (UINT32,
    * which Spark reads as LongType) would sign-flip above Int.MaxValue
    * and are rejected the way strings/floats are. Date/timestamp/time
    * annotations ride signed ints and stay exact. */
  private def signedIntStats(
      cc: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val pt = cc.getPrimitiveType
    val phys = pt.getPrimitiveTypeName
    val intLike = phys == PrimitiveTypeName.INT32 ||
      phys == PrimitiveTypeName.INT64
    intLike && (pt.getLogicalTypeAnnotation match {
      case null => true
      case i: LogicalTypeAnnotation.IntLogicalTypeAnnotation => i.isSigned
      case _: LogicalTypeAnnotation.DateLogicalTypeAnnotation => true
      case _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation => true
      case _: LogicalTypeAnnotation.TimeLogicalTypeAnnotation => true
      case _ => false
    })
  }

  /** Per-column storage statistics from footers only — the
    * `parquet_metadata` introspection surface: for every leaf column,
    * (value count, null count if every chunk stamps one, integer
    * min/max if the column is INT32/INT64 with exact stats in every
    * chunk). Absent statistics surface as NULLs, never guesses. */
  def columnReport(spark: SparkSession, path: String)
      : Seq[(String, Long, Option[Long], Option[Long], Option[Long])] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val acc = scala.collection.mutable.LinkedHashMap
      .empty[String, (Long, Option[Long], Option[Long], Option[Long])]
    parquetFiles(spark, path).foreach { p =>
      val in = HadoopInputFile.fromPath(new Path(p), conf)
      val r = ParquetFileReader.open(in)
      try {
        r.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.foreach { cc =>
            val name = cc.getPath.toDotString
            val st = cc.getStatistics
            val nulls =
              if (st != null && st.isNumNullsSet) Some(st.getNumNulls)
              else None
            val (mn, mx) =
              if (signedIntStats(cc) && st != null && st.hasNonNullValue) {
                def asLong(v: AnyRef): Long = v match {
                  case i: java.lang.Integer => i.toLong
                  case l: java.lang.Long => l.longValue()
                }
                (Some(asLong(st.genericGetMin.asInstanceOf[AnyRef])),
                  Some(asLong(st.genericGetMax.asInstanceOf[AnyRef])))
              } else (None, None)
            val prev = acc.get(name)
            acc(name) = prev match {
              case None => (cc.getValueCount, nulls, mn, mx)
              case Some((c0, n0, mn0, mx0)) => (
                c0 + cc.getValueCount,
                for (a <- n0; b2 <- nulls) yield a + b2,
                for (a <- mn0; b2 <- mn) yield math.min(a, b2),
                for (a <- mx0; b2 <- mx) yield math.max(a, b2))
            }
          }
        }
      } finally r.close()
    }
    acc.iterator.map { case (k, (c, n, mn, mx)) => (k, c, n, mn, mx) }.toSeq
  }

  /** Exact (row count, per-column integer min/max) from footers, or
    * None when ANY chunk of a requested column lacks exact statistics,
    * is all-null, or is not a 32/64-bit integer physical type — the
    * fold must be exact or absent, never approximate. Only integer
    * min/max is offered: parquet may truncate binary/string stats,
    * and float stats have NaN-ordering caveats; integers are the only
    * type whose chunk stats are unconditionally exact. One footer
    * read per file serves every requested column. */
  def tableStats(spark: SparkSession, path: String, cols: Seq[String],
      distributeAbove: Int = 64): Option[(Long, Map[String, (Long, Long)])] = {
    val files = parquetFiles(spark, path)
    def statsOf(p: String, conf: Configuration):
        Option[(Long, Map[String, (Long, Long)])] = {
      import scala.jdk.CollectionConverters._
      val in = HadoopInputFile.fromPath(new Path(p), conf)
      val r = ParquetFileReader.open(in)
      try {
        val blocks = r.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val mm = scala.collection.mutable.Map.empty[String, (Long, Long)]
        val ok = cols.forall { name =>
          blocks.forall { b =>
            b.getColumns.asScala.find(_.getPath.toDotString == name) match {
              case Some(cc) =>
                val st = cc.getStatistics
                if (!signedIntStats(cc) || st == null ||
                    !st.hasNonNullValue) false
                else {
                  val mn = st.genericGetMin match {
                    case i: java.lang.Integer => i.toLong
                    case l: java.lang.Long => l.longValue()
                  }
                  val mx = st.genericGetMax match {
                    case i: java.lang.Integer => i.toLong
                    case l: java.lang.Long => l.longValue()
                  }
                  val cur = mm.get(name)
                  mm(name) = (cur.fold(mn)(c => math.min(c._1, mn)),
                    cur.fold(mx)(c => math.max(c._2, mx)))
                  true
                }
              case None => false
            }
          }
        }
        if (ok) Some((rows, mm.toMap)) else None
      } finally r.close()
    }
    // empty listing (a layout the lister does not understand) → None:
    // the caller falls back to the scan, never to a fabricated 0-row
    // answer
    if (files.isEmpty) return None
    val conf = spark.sparkContext.hadoopConfiguration
    val perFile: Seq[Option[(Long, Map[String, (Long, Long)])]] =
      if (files.size <= distributeAbove) files.map(statsOf(_, conf))
      else {
        import spark.implicits._
        // session conf on the executors, as in rowCount above
        val bconf = spark.sparkContext.broadcast(
          new SerHadoopConf(spark.sparkContext.hadoopConfiguration))
        spark.createDataset(files)
          .repartition(math.min(files.size, 256))
          .mapPartitions { it =>
            val c = bconf.value.value
            it.map(p => statsOf(p, c).map { case (r0, m) => (r0, m.toSeq) })
          }.collect().toSeq
          .map(_.map { case (r0, m) => (r0, m.toMap) })
      }
    if (perFile.exists(_.isEmpty)) None
    else {
      val folded = perFile.flatten.foldLeft(
        (0L, Map.empty[String, (Long, Long)])) { case ((rows, acc), (r0, m)) =>
        (rows + r0, m.foldLeft(acc) { case (a, (k, (mn, mx))) =>
          a.get(k) match {
            case Some((amn, amx)) =>
              a + (k -> (math.min(amn, mn), math.max(amx, mx)))
            case None => a + (k -> ((mn, mx)))
          }
        })
      }
      // a zero-row-group file is neutral (contributes rows=0, no
      // min/max), so an all-empty table can fold to a map MISSING a
      // requested column — min/max over zero rows is NULL, which only
      // the scan path can produce; fall back rather than crash the
      // rewrite's mm(c) lookup
      if (cols.forall(folded._2.contains)) Some(folded) else None
    }
  }
}
