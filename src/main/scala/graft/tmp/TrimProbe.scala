package graft.tmp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TrimProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = Seq("hi.\n", "\nhi.", "hi. ", "", "\n", "a b").toDF("t")
    d.select(col("t"), graft.operators.TextAnalysis.tokens(col("t")).as("toks"),
        graft.functions.TextExpressions.wordNGramsAll(col("t"), 2).as("g2"))
      .collect().foreach(r => println(
        s"${r.getString(0).replace("\n","\\n")!=null} [${r.getString(0).replace("\n","\\n")}] toks=${r.getSeq[String](1).mkString("|")} g2=${r.getSeq[String](2).map(_.replace("\n","\\n")).mkString("|")}"))
    spark.stop()
  }
}
