package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster-scale techniques pinned as behavior, not just prose:
  * salted joins produce identical results while splitting hot keys, and
  * bucketed tables join without a shuffle. */
class ScaleTechniquesSpec extends SparkSpec {

  import spark.implicits._

  test("salted join ≡ plain join on a 90%-skewed key; hot key splits into salt groups") {
    // 9000 rows on one key, 1000 spread over 100 keys
    val left = ((1 to 9000).map(i => (1L, i)) ++
      (1 to 1000).map(i => (1L + i % 100 + 1, i))).toDF("k", "v")
    val right = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedJoin(left, right, "k", factor = 8)
      .select(plain.columns.map(col): _*)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)

    // the hot key's rows really are spread across several salt values
    val saltSpread = left.withColumn("__salt",
        pmod(hash(struct(left.columns.map(col): _*)), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(saltSpread >= 6, s"hot key only landed in $saltSpread salt groups")
  }

  test("salting is deterministic under recompute (retry-safe, no rand())") {
    val df = (1 to 100).map(i => (i.toLong, i)).toDF("k", "v")
    val s1 = SkewJoin.saltedJoin(df, Seq((1L, "x")).toDF("k", "name"), "k").collect()
    val s2 = SkewJoin.saltedJoin(df, Seq((1L, "x")).toDF("k", "name"), "k").collect()
    assert(s1.toSeq == s2.toSeq)
  }

  test("bucketed tables join with zero Exchange (co-located join)") {
    val dir = sf("sf0.001") // tables land in the default warehouse; dropped below
    for (t <- Seq("orders_bkt", "lineitem_bkt")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    spark.read.parquet(s"$dir/orders.parquet")
      .write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")

    // force the sort-merge path (orders is tiny at sf0.001 and would
    // auto-broadcast, which proves nothing about bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // neither join side may shuffle: bucket layout IS the partitioning
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join still shuffles a side:\n$plan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
