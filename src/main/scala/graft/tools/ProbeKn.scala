package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind the shingle-path scaladocs: an INLINED
  * tokens(text) inside shingles() re-tokenizes per reference
  * (CollapseProject declines to merge, but only when the token array
  * is projected FIRST — the inline form pays ~20×), and the
  * element-lookup shingle build beats slice()+array_join. Keep: the
  * numbers in Codecs.shingles / tTrigramKn cite this runner. */
object ProbeKn {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[$name] n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val docs = graft.SparkEntry.T(spark, dir, "documents")
    val inline = docs.select(explode(
      graft.codec.Codecs.shingles(graft.codec.Codecs.tokens(col("text")), 3)).as("s"))
    t("trigram occ, tokens INLINED (the anti-pattern)")(inline.count())
    val projected = docs.select(graft.codec.Codecs.tokens(col("text")).as("tk"))
      .select(explode(graft.codec.Codecs.shingles(col("tk"), 3)).as("s"))
    t("trigram occ, tokens projected first (the product path)")(projected.count())
    t("multiset equal check (0 = identical)")(
      inline.groupBy("s").count().join(
        projected.groupBy("s").count(), Seq("s", "count"), "full_outer")
        .filter(col("s").isNull).count())
    val full = graft.SparkEntry.queries("t_trigram_kn")(spark, dir)
    t("t_trigram_kn full (cold)")(full.count())
    t("t_trigram_kn full (warm)")(full.count())
    spark.stop()
  }
}
