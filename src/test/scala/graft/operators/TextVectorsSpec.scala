package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The feature-hash kernel must be indistinguishable from the
  * declarative explode + groupBy formulation it replaces (bucket =
  * first 13 md5 hex digits mod dim, sign = parity of hex digit 14),
  * and the hashed kNN must behave like a cosine search.
  */
class TextVectorsSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(docs: org.apache.spark.sql.DataFrame, dim: Int) =
    docs.select($"doc_id",
        explode(filter(split($"text", " "), w => w =!= "")).as("word"))
      .select($"doc_id",
        (conv(substring(md5($"word".cast("binary")), 1, 13), 16, 10)
          .cast("long") % dim).as("bucket"),
        when(conv(substring(md5($"word".cast("binary")), 14, 1), 16, 10)
          .cast("long") % 2 === 1, 1L).otherwise(-1L).as("s"))
      .groupBy($"doc_id", $"bucket").agg(sum($"s").as("w"))
      .filter($"w" =!= 0L)

  test("kernel matches the declarative explode+groupBy on varied texts") {
    val docs = Seq(
      (0L, "a b c d e a b"), (1L, "a a a a"), (2L, "one two"),
      (3L, "single"), (4L, ""), (5L, "a  b   c"), (6L, " leading"),
      (7L, "trailing "), (8L, "x y z x y z x y")
    ).toDF("doc_id", "text")
    for (dim <- Seq(16, 256)) {
      val fast = TextVectors.sparseEntries(docs, dim)
        .select($"doc_id", $"bucket".cast("long").as("bucket"), $"w")
      val slow = declarative(docs, dim)
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"dim=$dim kernel/declarative divergence")
    }
  }

  test("null text is null; empty text is an all-zero vector; dim bounds fail fast") {
    graft.functions.TextExpressions.register(spark)
    val got = Seq((0L, Some("a b")), (1L, None), (2L, Some("")))
      .toDF("doc_id", "text")
      .select($"doc_id", call_function("graft_fhash", $"text", lit(8)).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty)
    assert(got(2L).exists(_.asInstanceOf[scala.collection.Seq[Long]].forall(_ == 0L)))
    val e = intercept[Exception] {
      Seq("x").toDF("text")
        .select(call_function("graft_fhash", $"text", lit(1))).collect()
    }
    assert(e.getMessage != null)
  }

  test("hashedKnn ranks an exact duplicate at cosine 1.0 and excludes the query") {
    val base = Tables.load(spark, sf, "documents").limit(50)
    val dup = base.filter($"doc_id" === 0L)
      .select(lit(9999L).as("doc_id"), $"text")
    val got = TextVectors.hashedKnn(base.select($"doc_id", $"text").union(dup),
      queryDocId = 0L, dim = 256, k = 5).collect()
    assert(got.head.getLong(0) == 9999L && got.head.getDouble(1) == 1.0)
    assert(!got.map(_.getLong(0)).contains(0L))
  }

  test("clusterAssign: seeds claim themselves, near-copies follow their seed") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"), (1L, "one two three four"),
      (2L, "red green blue yellow"), (3L, "cat dog bird fish"),
      (10L, "red green blue yellow extra"), // near-copy of seed 2
      (11L, "one two three four five six")  // near-copy of seed 1
    ).toDF("doc_id", "text")
    val got = TextVectors.clusterAssign(docs, Seq(0L, 1L, 2L, 3L), dim = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert((0L to 3L).forall(i => got(i)._1 == i), got)
    assert(got(10L)._1 == 2L && got(11L)._1 == 1L, got)
    assert(got(10L)._2 == 2L && got(0L)._2 == 1L) // cluster sizes
    // a seed's score to itself is exactly -||c||² (integer arithmetic;
    // cc computed from the sparse entries so bucket collisions among
    // the seed's own words don't bias the expectation)
    val cc = TextVectors.sparseEntries(docs.filter($"doc_id" === 0L), dim = 64)
      .select(sum($"w" * $"w")).collect()(0).getLong(0)
    val score0 = TextVectors.clusterAssign(docs, Seq(0L, 1L, 2L, 3L), dim = 64)
      .filter($"doc_id" === 0L).collect()(0).getLong(2)
    assert(score0 == -cc, s"score $score0 != -cc ${-cc}")
  }

  test("hashed vectors feed the embedding ANN stack unchanged") {
    // the bridge claim: rename to (vec_id, embedding) and the existing
    // brute-force searcher runs on hashed text vectors as-is
    val emb = TextVectors.featureHashVectors(
        Tables.load(spark, sf, "documents").limit(100), dim = 64)
      .select($"doc_id".as("vec_id"),
        transform($"fvec", x => x.cast("float")).as("embedding"))
    val top = Similarity.bruteForceTopK(emb, queryVecId = 0L, k = 5)
    assert(top.count() == 5)
  }
}
