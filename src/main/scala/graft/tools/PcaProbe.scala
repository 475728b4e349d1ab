package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only: measures projected-space search recall for the PCA apply
  * operator across k, to ground embedding_pca_apply's recallFloor (not
  * part of the driver contract; safe to delete).
  */
object PcaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.001")
    val e = spark.read.parquet(dir + "/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
    val query = e.filter(col("vec_id") === 0)
    val kNN = 10
    val trueIds = LlmOps.cosineTopK(corpus, query, kNN).collect()
      .map(_.getLong(0)).toSet
    for (k <- Seq(4, 8, 16, 32)) {
      val fit = LlmOps.embeddingPcaFitK(corpus, k = k)
      val proj = LlmOps.embeddingPcaApply(corpus, fit)
      val qp = LlmOps.embeddingPcaApply(query, fit).select(col("proj").as("qp"))
      val projIds = proj.crossJoin(broadcast(qp))
        .select(col("vec_id"),
          LlmOps.round6(call_function("graft_dot", col("proj"), col("qp")) /
            (sqrt(call_function("graft_dot", col("proj"), col("proj"))) *
              sqrt(call_function("graft_dot", col("qp"), col("qp"))))).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(kNN)
        .collect().map(_.getLong(0)).toSet
      val recall = trueIds.intersect(projIds).size.toDouble / kNN
      val varCap = fit.eigenvalues.sum / fit.trace
      // overfetch tiers: true top-10 retained in projected top-C pool
      val pool = proj.crossJoin(broadcast(qp))
        .select(col("vec_id"),
          LlmOps.round6(call_function("graft_dot", col("proj"), col("qp")) /
            (sqrt(call_function("graft_dot", col("proj"), col("proj"))) *
              sqrt(call_function("graft_dot", col("qp"), col("qp"))))).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(100)
        .collect().map(_.getLong(0))
      val r50 = trueIds.intersect(pool.take(50).toSet).size.toDouble / kNN
      val r100 = trueIds.intersect(pool.toSet).size.toDouble / kNN
      println(f"dir=$dir k=$k%-3d recall@$kNN = $recall%.2f  pool50=$r50%.2f pool100=$r100%.2f varCapture=$varCap%.3f")
    }
    spark.stop()
  }
}
