package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Subjects
import graft.functions.{ArgMaxById, ScoredId}
import graft.functions.DotProduct.dot_ff
import graft.sources.Tables

/** The engine-extension surface (SURVEY.md §2.2 UDF/UDAF rows plus the
  * remaining join shape): a registered scalar UDF, a typed Aggregator
  * UDAF, and the right outer join.
  *
  * UDFs are a last resort in this engine (everything else is built-ins
  * or native expressions); these entries exist to pin the REGISTRATION
  * surface a user of the engine gets. */
object ExtensionOps extends QueryModule {

  val q51_join_right = QueryDef(
    "q51_join_right",
    (s, dir) => {
      val hi = Tables.load(s, dir, "lineitem").filter(col("l_quantity") >= 48)
      // right outer: every order survives, matched hi-quantity items count
      hi.join(Tables.load(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"), "right")
        .groupBy("o_orderkey")
        .agg(count(col("l_orderkey")).as("n_hi"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("tp_sum"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, count(l_orderkey) AS n_hi,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS tp_sum
            FROM (SELECT * FROM lineitem WHERE l_quantity >= 48) li
            RIGHT JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderkey ORDER BY o_orderkey"""))

  /** Scalar UDF surface: register a Scala function (the reference's
    * subject-depth notion — how many hierarchy levels a routing key
    * addresses) and use it in a query. The oracle reproduces the
    * semantics in SQL — which is also why UDFs stay a last resort: the
    * engine can't optimize what it can't see. */
  val q52_udf_scalar = QueryDef(
    "q52_udf_scalar",
    (s, dir) => {
      val subjectDepth = udf((subject: String) =>
        if (subject == null) 0L
        else subject.split('.').count(t => t != "_" && t != ">"
          && t != "UPDATES" && t != "STORAGE"
          && t != Subjects.ObjectName && t != Subjects.ObjectGroupName))
      s.udf.register("subject_depth", subjectDepth)
      val e = Tables.load(s, dir, "events")
        .withColumn("project", concat(lit("p"), (col("user_id") % 5).cast("string")))
        .withColumn("subject",
          when(col("event_type") === "signup", Subjects.projectSubjectCol(col("project")))
            .otherwise(Subjects.collectionSubjectCol(col("project"),
              concat(lit("c"), col("user_id").cast("string")))))
      e.select(col("event_id"), col("subject"),
          subjectDepth(col("subject")).as("depth"))
        .orderBy("event_id")
    },
    Some("""WITH e AS (
              SELECT event_id,
                CASE WHEN event_type = 'signup'
                     THEN 'UPDATES.STORAGE._.p' || CAST(user_id % 5 AS VARCHAR) || '._'
                     ELSE 'UPDATES.STORAGE._.p' || CAST(user_id % 5 AS VARCHAR) ||
                          '._.c' || CAST(user_id AS VARCHAR) || '._'
                END AS subject
              FROM events)
            SELECT event_id, subject,
                   CAST(len(list_filter(string_split(subject, '.'),
                     t -> t NOT IN ('_', '>', 'UPDATES', 'STORAGE', 'OBJECT', 'OBJECTGROUP')))
                     AS BIGINT) AS depth
            FROM e ORDER BY event_id"""))

  /** UDAF surface: argmax-by-cosine per label via a typed Aggregator
    * (partial/final merge — one candidate per partition crosses the
    * shuffle). Finds each label's most query-similar member vector. */
  val q53_udaf_argmax = QueryDef(
    "q53_udaf_argmax",
    (s, dir) => {
      val argmax = udaf(new ArgMaxById())
      val e = Tables.load(s, dir, "embeddings")
      val probe = e.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      val scored = e.crossJoin(broadcast(probe))
        .filter(col("vec_id") =!= 0)
        .select(col("label"), col("vec_id").as("id"),
          dot_ff(col("embedding"), col("qv")).as("score"))
      scored.groupBy("label")
        .agg(argmax(col("id"), col("score")).as("best"))
        .select(col("label").cast("long").as("label"),
          col("best.id").as("best_id"),
          col("best.score").as("best_score"))
        .orderBy("label")
    },
    Some("""WITH probe AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT label, vec_id AS id,
                     list_reduce(list_transform(range(1, 65),
                       i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)),
                       (x, y) -> x + y) AS score
              FROM embeddings, probe WHERE vec_id <> 0),
            ranked AS (
              SELECT label, id, score,
                     row_number() OVER (PARTITION BY label
                                        ORDER BY score DESC, id DESC) AS rn
              FROM scored)
            SELECT CAST(label AS BIGINT) AS label, id AS best_id, score AS best_score
            FROM ranked WHERE rn = 1 ORDER BY label"""))

  /** Bloom-filter semi-join reduction — THE star-join technique at
    * 100 TB: build a bloom filter over the (filtered) dimension's keys,
    * broadcast the few-KB sketch, and discard non-matching fact rows
    * BEFORE the join so the shuffle carries only plausible matches.
    * Catalyst's own runtime-filter machinery (`BloomFilterAggregate` /
    * `BloomFilterMightContain`, reached through ColumnBridge — they are
    * internal expressions) is used explicitly; both sides hash with
    * xxhash64 as the runtime filter does. The actual join still runs,
    * so bloom FALSE POSITIVES are eliminated and the result equals the
    * plain join — which is exactly what the oracle computes. */
  val q83_bloom_prefilter = QueryDef(
    "q83_bloom_prefilter",
    (s, dir) => {
      import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val dim = Tables.load(s, dir, "supplier")
        .filter(col("s_nationkey") === 5).select(col("s_suppkey"))
      val bloomAgg = column(new BloomFilterAggregate(
        expression(xxhash64(col("s_suppkey"))),
        Literal(1000L), Literal(8L * 1024 * 8)).toAggregateExpression())
      val bloom = dim.agg(bloomAgg.as("bf"))
      // the serialized sketch is a few KB — materialize it as a LITERAL,
      // which is exactly how Catalyst's InjectRuntimeFilter ships it
      // (might_contain requires a constant/scalar-subquery bloom side)
      val bf = bloom.head().getAs[Array[Byte]](0)
      val pre = Tables.load(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_quantity"))
        .filter(column(BloomFilterMightContain(
          Literal(bf, org.apache.spark.sql.types.BinaryType),
          expression(xxhash64(col("l_suppkey"))))))
      pre.join(broadcast(dim), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("qty"))
        .orderBy("l_suppkey")
    },
    Some("""SELECT l_suppkey, count(*) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            WHERE s_nationkey = 5
            GROUP BY l_suppkey ORDER BY l_suppkey"""))

  override val defs: Seq[QueryDef] =
    Seq(q51_join_right, q52_udf_scalar, q53_udaf_argmax, q83_bloom_prefilter)
}
