package graft

import org.apache.spark.sql.functions._

/** The co-located-join claim from SCALING.md, proven on real plans: two
  * tables bucketed on the join key sort-merge-join with ZERO exchanges —
  * the pre-partitioning pattern that makes the CDC fold and the hierarchy
  * nest shuffle-free when master and change tables share a bucket layout.
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero exchanges") {
    val cust = spark.read
      .parquet("/root/testdata/sf0.001/customer.parquet")
    val orders = spark.read
      .parquet("/root/testdata/sf0.001/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS graft_b_cust")
    spark.sql("DROP TABLE IF EXISTS graft_b_ord")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("graft_b_cust")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("graft_b_ord")
    // disable auto-broadcast: at test size Spark would broadcast the small
    // side and never exercise the bucketed sort-merge path under test
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_b_cust")
        .join(spark.table("graft_b_ord"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).alias("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not exchange either side; the only allowed
      // exchange would belong to a post-join agg, but grouping on the
      // bucketed key keeps even that co-located
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // and the result matches the plain (shuffling) join
      val expected = cust.join(orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).alias("n"))
      assert(joined.as[(Long, Long)].collect().toSet ==
        expected.as[(Long, Long)].collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_b_cust")
      spark.sql("DROP TABLE IF EXISTS graft_b_ord")
    }
  }

  test("hive-style partitioned write prunes partitions under a filter") {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.partitionBy("event_type").mode("overwrite").parquet(tmpDir)
    val scan = spark.read.parquet(tmpDir)
      .where(col("event_type") === "purchase")
      .select(col("event_id"))
    val physical = scan.queryExecution.executedPlan
    val fileScan = physical.collectLeaves().map(_.toString).mkString("\n")
    // the filter must land in PartitionFilters (directory pruning), not as
    // a post-scan row filter over every partition
    assert(fileScan.contains("PartitionFilters") &&
      fileScan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("purchase"), fileScan)
    // and ReadSchema is pruned to the projected column
    assert(fileScan.contains("ReadSchema: struct<event_id:bigint>"), fileScan)
  }
}
