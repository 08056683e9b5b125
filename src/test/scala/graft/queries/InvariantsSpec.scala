package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.Identity

/** Semantic invariants the oracle cannot see — engine-internal ground
  * truths: LSH recall vs in-engine brute force, sessionization as a
  * partition of events, identity-column properties.
  */
class InvariantsSpec extends SparkSpec {

  test("minhash LSH finds exactly the brute-force Jaccard≥0.8 pairs at sf0.001") {
    val lsh = SimilarityQueries.qMinhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // in-engine brute force: every shared-shingle pair with exact jaccard
    val docs = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("tk", split(col("text"), " "))
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(tk)-3), i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))")))
        .as("shingle"))
    val sizes = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = docs.as("a")
      .join(docs.as("b"), col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
      .filter(col("inter").cast("double") /
        (col("sa.n") + col("sb.n") - col("inter")) >= 0.8)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == brute, s"LSH missed ${brute -- lsh}, extra ${lsh -- brute}")
  }

  test("sessionization partitions events exactly: Σ session sizes = row count") {
    val sessions = AdvancedQueries.qSessionize(spark, sfDir)
    val total = sessions.agg(sum("n_events")).collect().head.getLong(0)
    val events = Tables.events(spark, sfDir).count()
    assert(total == events)
    // within a session, duration is consistent with bounds
    val bad = sessions.filter(col("session_end") - col("session_start") =!= col("duration_sec")).count()
    assert(bad == 0)
  }

  test("identity content hash is deterministic and field-order sensitive by design") {
    val docs = Tables.documents(spark, sfDir).limit(10)
    val h1 = Identity.withIdentity(docs, "id1", Seq("doc_id", "text"))
      .select("id1").collect().map(_.getString(0)).toSeq
    val h2 = Identity.withIdentity(docs, "id2", Seq("doc_id", "text"))
      .select("id2").collect().map(_.getString(0)).toSeq
    assert(h1 == h2) // deterministic across runs
    val swapped = Identity.withIdentity(docs, "id3", Seq("text", "doc_id"))
      .select("id3").collect().map(_.getString(0)).toSeq
    assert(h1 != swapped) // canonical form fixes field order at the call site
    // uniqueId really is unique per row
    val uniq = docs.select(Identity.uniqueId.as("u")).collect().map(_.getString(0))
    assert(uniq.distinct.length == uniq.length)
  }

  test("q_pack is partition-count invariant (PrefixSum total order)") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def packs(parts: String): Map[Long, (Long, Long, Long)] = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try TextQueries.all("q_pack")._1(spark, sfDir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    val p1 = packs("1")
    val p7 = packs("7")
    assert(p1 == p7, "pack assignment depends on partitioning")
    assert(p1.nonEmpty)
    // packing covers every doc exactly once
    val total = p1.values.map(_._1).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("hash sampling is stable across runs and subsets the corpus") {
    val a = SimilarityQueries.qHashSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = SimilarityQueries.qHashSample(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
    val total = Tables.documents(spark, sfDir).count()
    assert(a.values.sum < total && a.values.sum > 0)
  }
}
