package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scalar-function surface (SURVEY.md §2.2): string, date/time, math,
  * array (incl. higher-order), map, JSON, conditional. All row-level
  * expressions — embarrassingly parallel, fully inside whole-stage
  * codegen; the interesting part is dialect-exact parity with the
  * oracle (regexp flavors, rounding modes, 1-based indexing).
  */
object Scalars extends QueryModule {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.load(s, dir, n)

  val q25_scalar_string = QueryDef(
    "q25_scalar_string",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_brand")).as("ubrand"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        expr("split_part(p_name, ' ', 1)").as("first_word"),
        expr("split_part(p_name, ' ', -1)").as("last_word"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("tail_word"),
        lpad(col("p_size").cast("string"), 4, "0").as("size4"),
        instr(col("p_name"), "widget").cast("long").as("widget_at"),
        col("p_name").startsWith("large").as("is_large"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        trim(lit("  x  ")).as("trimmed"),
        translate(col("p_brand"), "#", "-").as("brand_dash"),
        reverse(col("p_type")).as("type_rev"),
        repeat(col("p_brand"), 2).as("brand2"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
            lower(p_name) AS lname,
            upper(p_brand) AS ubrand,
            CAST(length(p_name) AS BIGINT) AS name_len,
            substring(p_name, 1, 5) AS prefix5,
            split_part(p_name, ' ', 1) AS first_word,
            split_part(p_name, ' ', -1) AS last_word,
            regexp_replace(p_name, ' ', '_', 'g') AS snake,
            regexp_extract(p_name, '([a-z]+)$', 1) AS tail_word,
            lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
            CAST(instr(p_name, 'widget') AS BIGINT) AS widget_at,
            starts_with(p_name, 'large') AS is_large,
            concat_ws('|', p_brand, p_type) AS brand_type,
            trim('  x  ') AS trimmed,
            translate(p_brand, '#', '-') AS brand_dash,
            reverse(p_type) AS type_rev,
            repeat(p_brand, 2) AS brand2
            FROM part ORDER BY p_partkey"""))

  val q26_scalar_datetime = QueryDef(
    "q26_scalar_datetime",
    (s, dir) => t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"),
        add_months(col("o_orderdate"), 3).as("plus3mo"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
            CAST(year(o_orderdate) AS BIGINT) AS yr,
            CAST(month(o_orderdate) AS BIGINT) AS mo,
            CAST(day(o_orderdate) AS BIGINT) AS dom,
            CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
            CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
            CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
            CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
            last_day(o_orderdate) AS month_end,
            CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
            CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3mo,
            CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
            make_date(CAST(year(o_orderdate) AS BIGINT), 1, 1) AS year_start
            FROM orders ORDER BY o_orderkey"""))

  val q27_scalar_math = QueryDef(
    "q27_scalar_math",
    (s, dir) => t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 2000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        abs(col("l_extendedprice") - 30000.0).as("dist"),
        round(col("l_extendedprice"), 1).as("rounded1"),
        round(col("l_extendedprice"), -2).as("rounded_neg2"),
        floor(col("l_extendedprice")).cast("long").as("floored"),
        ceil(col("l_extendedprice")).cast("long").as("ceiled"),
        sqrt(col("l_quantity")).as("root_qty"),
        round(log(col("l_quantity") + 1.0), 6).as("ln_qty"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        (col("l_orderkey") % 7).cast("long").as("mod7"),
        // BIGINT in both forms: DuckDB's sign() returns TINYINT, Spark's
        // signum() DOUBLE — numerically equal but hash-different in the
        // driver's typed compare (round-1 q27 hash mismatch).
        signum(col("l_extendedprice") - 30000.0).cast("long").as("sgn"),
        greatest(col("l_quantity"), col("l_discount") * 100.0).as("g"),
        least(col("l_quantity"), col("l_tax") * 100.0).as("l"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey"),
    Some("""SELECT l_orderkey, l_linenumber, l_partkey,
            abs(l_extendedprice - 30000.0) AS dist,
            round(l_extendedprice, 1) AS rounded1,
            round(l_extendedprice, -2) AS rounded_neg2,
            CAST(floor(l_extendedprice) AS BIGINT) AS floored,
            CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
            sqrt(l_quantity) AS root_qty,
            round(ln(l_quantity + 1.0), 6) AS ln_qty,
            l_quantity * l_quantity AS qty_sq,
            CAST(l_orderkey % 7 AS BIGINT) AS mod7,
            CAST(sign(l_extendedprice - 30000.0) AS BIGINT) AS sgn,
            greatest(l_quantity, l_discount * 100.0) AS g,
            least(l_quantity, l_tax * 100.0) AS l
            FROM lineitem WHERE l_orderkey < 2000
            ORDER BY l_orderkey, l_linenumber, l_partkey"""))

  /** Array ops incl. higher-order functions. The fold in `chars_sum`
    * reproduces the reference's fan-out idiom (array build + per-element
    * transform) on real data. */
  val q28_scalar_array = QueryDef(
    "q28_scalar_array",
    (s, dir) => t(s, dir, "documents")
      .withColumn("words", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("words")).cast("long").as("n_words"),
        element_at(col("words"), 1).as("first_word"),
        element_at(col("words"), -1).as("last_word"),
        array_contains(col("words"), "spark").as("has_spark"),
        array_join(slice(col("words"), 1, 3), " ").as("first3"),
        array_join(sort_array(array_distinct(slice(col("words"), 1, 5))), ",").as("first5_sorted"),
        expr("CAST(aggregate(transform(words, w -> length(w)), 0, (acc, x) -> acc + x) AS BIGINT)").as("chars_sum"),
        expr("CAST(size(filter(words, w -> length(w) > 4)) AS BIGINT)").as("n_long_words"),
        expr("CAST(size(array_distinct(words)) AS BIGINT)").as("n_distinct"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
            string_split(text, ' ')[1] AS first_word,
            string_split(text, ' ')[-1] AS last_word,
            list_contains(string_split(text, ' '), 'spark') AS has_spark,
            array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
            array_to_string(list_sort(list_distinct(string_split(text, ' ')[1:5])), ',') AS first5_sorted,
            CAST(list_sum(list_transform(string_split(text, ' '), w -> length(w))) AS BIGINT) AS chars_sum,
            CAST(len(list_filter(string_split(text, ' '), w -> length(w) > 4)) AS BIGINT) AS n_long_words,
            CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
            FROM documents ORDER BY doc_id"""))

  /** Map construction + lookup. The oracle reproduces the SEMANTICS
    * (per-user per-type counts) in portable SQL — map internals differ
    * across engines, values must not. */
  val q29_scalar_map = QueryDef(
    "q29_scalar_map",
    (s, dir) => t(s, dir, "events")
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt")))))
        .as("type_counts"))
      .select(col("user_id"),
        coalesce(element_at(col("type_counts"), "purchase"), lit(0L)).as("n_purchase"),
        coalesce(element_at(col("type_counts"), "error"), lit(0L)).as("n_error"),
        size(col("type_counts")).cast("long").as("n_types"),
        array_join(map_keys(col("type_counts")), ",").as("types"))
      .orderBy("user_id"),
    Some("""SELECT user_id,
            CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchase,
            CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0) AS BIGINT) AS n_error,
            count(DISTINCT event_type) AS n_types,
            array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
            FROM events GROUP BY user_id ORDER BY user_id"""))

  val q30_scalar_json = QueryDef(
    "q30_scalar_json",
    (s, dir) => t(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        from_json(col("props"), lit("k LONG")).getField("k").as("k_struct"),
        get_json_object(col("props"), "$.missing").isNull.as("no_missing"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
            CAST(props->>'k' AS BIGINT) AS k,
            CAST(props->>'k' AS BIGINT) AS k_struct,
            props->>'missing' IS NULL AS no_missing
            FROM events ORDER BY event_id"""))

  val q31_scalar_conditional = QueryDef(
    "q31_scalar_conditional",
    (s, dir) => t(s, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<masked>")).as("seg_masked"),
        greatest(col("c_acctbal"), lit(0.0)).as("bal_floor0"),
        least(col("c_acctbal"), lit(1000.0)).as("bal_cap"),
        (col("c_nationkey") % 2 === 0).as("even_nation"),
        expr("nvl2(nullif(c_mktsegment, 'BUILDING'), 'other', 'building')").as("nvl2_demo"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey,
            CASE WHEN c_acctbal < 0 THEN 'negative'
                 WHEN c_acctbal < 5000 THEN 'mid'
                 ELSE 'high' END AS bal_band,
            coalesce(nullif(c_mktsegment, 'BUILDING'), '<masked>') AS seg_masked,
            greatest(c_acctbal, 0.0) AS bal_floor0,
            least(c_acctbal, 1000.0) AS bal_cap,
            c_nationkey % 2 = 0 AS even_nation,
            CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                 THEN 'other' ELSE 'building' END AS nvl2_demo
            FROM customer ORDER BY c_custkey"""))

  override val defs: Seq[QueryDef] = Seq(
    q25_scalar_string, q26_scalar_datetime, q27_scalar_math,
    q28_scalar_array, q29_scalar_map, q30_scalar_json,
    q31_scalar_conditional)
}
