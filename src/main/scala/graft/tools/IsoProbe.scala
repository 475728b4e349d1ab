package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps
object IsoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    val corpus = e.filter(col("vec_id") =!= 0)
    def time(n: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"[iso] $n%-36s ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
    time("kmeansCentroids it=0 (seed only)")(LlmOps.kmeansCentroids(corpus, 4, 0))
    time("kmeansCentroids it=1")(LlmOps.kmeansCentroids(corpus, 4, 1))
    time("kmeansCentroids it=2")(LlmOps.kmeansCentroids(corpus, 4, 2))
    time("pq it=0")(LlmOps.pqTrainCodebooks(corpus, 4, 4, 0))
    time("pq it=1")(LlmOps.pqTrainCodebooks(corpus, 4, 4, 1))
    time("pq it=2")(LlmOps.pqTrainCodebooks(corpus, 4, 4, 2))
    spark.stop()
  }
}
