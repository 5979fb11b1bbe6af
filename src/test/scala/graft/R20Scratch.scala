package graft

/** Round-scratch runner: execute named SparkEntry queries once at a
  * given sf dir and print their row counts — the quick correctness
  * smoke before the full Verify sweep. Run:
  * sbt "Test/runMain graft.R20Scratch <sfDir> <query> [query...]". */
object R20Scratch {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = args.head
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sf).count()
      println(f"$name ROWS=$n TIME=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
  }
}
