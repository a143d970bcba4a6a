package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property round-trips for the §1.2 type layer: random typed rows
  * (extremes, unicode, nulls) survive a parquet write→read unchanged.
  * (ScalaCheck generators sampled with fixed seeds — the scalatest
  * bridge isn't in the offline cache.) */
class TypeRoundTripSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("mixed-type rows round-trip through parquet exactly") {
    val genRow: Gen[Row] = for {
      l <- Gen.oneOf(Gen.long, Gen.oneOf(Long.MinValue, Long.MaxValue, 0L))
      i <- Gen.chooseNum(Int.MinValue, Int.MaxValue)
      d <- Gen.oneOf(Gen.double, Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
        Double.MaxValue, Double.NegativeInfinity))
      s <- Gen.oneOf(Gen.alphaNumStr, Gen.const("héllo wörld 中文 🚀"),
        Gen.const(""))
      b <- Gen.oneOf(true, false)
      dayOffset <- Gen.chooseNum(-20000, 20000)
      tsMs <- Gen.chooseNum(0L, 4102444800000L) // 1970..2100
      dec <- Gen.chooseNum(-999999999L, 999999999L)
      fs <- Gen.listOfN(4, Gen.chooseNum(-1e6f, 1e6f))
      nullMask <- Gen.chooseNum(0, 7)
    } yield Row(
      if ((nullMask & 1) != 0) null else java.lang.Long.valueOf(l),
      i,
      d,
      if ((nullMask & 2) != 0) null else s,
      b,
      Date.valueOf(java.time.LocalDate.ofEpochDay(dayOffset.toLong)),
      new Timestamp(tsMs),
      if ((nullMask & 4) != 0) null
      else new java.math.BigDecimal(java.math.BigInteger.valueOf(dec), 2),
      fs.toArray)

    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("b", BooleanType), StructField("dt", DateType),
      StructField("ts", TimestampType),
      StructField("dec", DecimalType(11, 2)),
      StructField("fs", ArrayType(FloatType, containsNull = false))))

    val rows = samples(genRow, 200)
    assert(rows.size >= 150)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, schema)
    val dir = Files.createTempDirectory("graft_rt").toString + "/t"
    df.write.parquet(dir)
    val back = spark.read.schema(schema).parquet(dir)
    assert(back.count() == rows.size)
    // exceptAll both ways — exact value equality incl. NaN/null semantics
    assert(df.exceptAll(back).count() == 0)
    assert(back.exceptAll(df).count() == 0)
  }
}
