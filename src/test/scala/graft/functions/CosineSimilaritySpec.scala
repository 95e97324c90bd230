package graft.functions

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

/** The native codegen'd cosine must be bit-identical to the composed
  * HOF reference form, stay inside WholeStageCodegen, and handle
  * nulls/zero vectors the same way. */
class CosineSimilaritySpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")

  test("native ≡ composed HOF form, bit-identical over the fixture") {
    GraftFunctions.register(spark)
    val pairs = emb.limit(50).select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.limit(20).select(col("embedding").as("b")))
    val d = pairs.select(
      GraftFunctions.cosine(col("a"), col("b")).as("native"),
      Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b")))
        .as("composed"))
    assert(d.filter(col("native") =!= col("composed")).count() == 0)
  }

  test("SQL registration: usable from spark.sql after register()") {
    GraftFunctions.register(spark)
    emb.limit(3).createOrReplaceTempView("emb_cos_test")
    val rows = spark.sql(
      "SELECT graft_cosine(embedding, embedding) AS c FROM emb_cos_test").collect()
    assert(rows.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-12))
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    GraftFunctions.register(spark)
    val df = emb.limit(10).select(
      GraftFunctions.cosine(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
  }

  test("null inputs → null; zero vector → NaN (both engines' division semantics)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 0.0)), Some(Seq(1.0, 0.0))),
      (None, Some(Seq(1.0, 0.0))),
      (Some(Seq(0.0, 0.0)), Some(Seq(1.0, 0.0)))).toDF("a", "b")
    val out = df.select(GraftFunctions.cosine(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0).isNaN)
  }
}
