package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class SoftDedupOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("soft-dedup weights: 1/cluster_size in exact integer micro units") {
    val docs = Seq(0L, 1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b") // {0,1,2} + {3}
    val cl = DedupOps.duplicateClusters(docs, pairs, driverMaxEdges = 1L << 20)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
    val out = cl.withColumn("cluster_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("cluster_size"),
        floor(lit(1000000.0) / col("cluster_size")).cast("long").as("weight_micro"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(0L) == ((3L, 333333L)))
    assert(out(1L) == ((3L, 333333L)))
    assert(out(2L) == ((3L, 333333L)))
    assert(out(3L) == ((1L, 1000000L))) // singleton keeps full weight
  }

  test("source overlap: shared distinct bigrams counted once per source pair") {
    val docs = Seq(
      (0L, "a b c", "s1"),
      (1L, "a b d", "s2"), // shares "a b" with s1
      (2L, "a b x", "s2"), // same shared gram again — counted ONCE
      (3L, "q r s", "s3")  // shares nothing
    ).toDF("doc_id", "text", "source")
    val gs = docs.select(col("source"), explode(array_distinct(
      TextOps.shingles(TextOps.tokens(col("text")), 2))).as("gram")).distinct()
    val out = gs.groupBy("gram")
      .agg(sort_array(collect_set(col("source"))).as("ss"))
      .filter(size(col("ss")) > 1)
      .select(explode(flatten(transform(col("ss"), (a, i) =>
        transform(slice(col("ss"), i + 2, size(col("ss"))), b =>
          struct(a.as("sa"), b.as("sb")))))).as("p"))
      .select(col("p.sa").as("source_a"), col("p.sb").as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out == Map(("s1", "s2") -> 1L))
  }
}
