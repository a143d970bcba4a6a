package graft

/** Tripwire for driver-side testdata regeneration — the generalized
  * events lesson: round 8's regen changed the events timestamp encoding
  * and the suite only failed INDIRECTLY (10 queries threw, 1 silently
  * wrong). This spec pins every table's loaded schema by name, so the
  * next regen that changes a column name or type fails HERE with the
  * table and column spelled out. `ts` is asserted post-normalization
  * (the loader owns the physical-encoding matrix; see
  * [[Tables.normalizeEvents]] / EventsEncodingSpec), and integer widths
  * are allowed to widen (int32→int64 reads compatibly through every
  * query; a width NARROWING or a type-family change fails).
  */
class TestdataSchemaSpec extends SparkSpec {

  // column -> expected type family (widths normalized: int means any
  // integral type, the common read-compatible case)
  private def family(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => "int"
      case FloatType | DoubleType => "float"
      case StringType => "string"
      case TimestampType | TimestampNTZType => "timestamp"
      case ArrayType(e, _) => s"array<${family(e)}>"
      case other => other.simpleString
    }
  }

  private val expected: Map[String, Map[String, String]] = Map(
    "region" -> Map("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Map("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Map("c_custkey" -> "int", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "float",
      "c_mktsegment" -> "string"),
    "supplier" -> Map("s_suppkey" -> "int", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "float"),
    "part" -> Map("p_partkey" -> "int", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "float"),
    "orders" -> Map("o_orderkey" -> "int", "o_custkey" -> "int",
      "o_orderstatus" -> "string", "o_totalprice" -> "float",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Map("l_orderkey" -> "int", "l_partkey" -> "int",
      "l_suppkey" -> "int", "l_linenumber" -> "int",
      "l_quantity" -> "float", "l_extendedprice" -> "float",
      "l_discount" -> "float", "l_tax" -> "float",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    // post-normalization shape: ts is ALWAYS a timestamp and ts_ns the
    // int64 nanos side-channel, whatever the physical encoding was
    "events" -> Map("event_id" -> "int", "ts" -> "timestamp",
      "ts_ns" -> "int", "user_id" -> "int", "event_type" -> "string",
      "value" -> "float", "props" -> "string"),
    "documents" -> Map("doc_id" -> "int", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "int"),
    "embeddings" -> Map("vec_id" -> "int",
      "embedding" -> "array<float>", "label" -> "int"))

  for (t <- Tables.names) {
    test(s"testdata table $t loads with the expected column/type families") {
      val got = Tables.t(spark, sf, t).schema
        .map(f => f.name -> family(f.dataType)).toMap
      val want = expected(t)
      val missing = want.keySet -- got.keySet
      val changed = want.filter { case (c, fam) =>
        got.get(c).exists(_ != fam) }
      assert(missing.isEmpty && changed.isEmpty,
        s"DRIVER TESTDATA CHANGED for $t — missing columns: $missing; " +
          s"type-family changes: ${changed.map { case (c, fam) =>
            s"$c: expected $fam, got ${got(c)}" }.mkString("; ")}. " +
          "Update the loaders (Tables.scala) and this snapshot together.")
    }
  }
}
