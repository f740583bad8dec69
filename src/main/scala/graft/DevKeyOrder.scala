package graft

/** Prints the suite's actual run order — `SparkEntry.queries` Map
  * iteration order, which Bench and Verify both follow. Needed to
  * reason about cross-key / time-window effects in full-suite runs
  * (r16 verdict: three keys regressed together at the driver only).
  * No SparkSession: the map's construction is session-free.
  */
object DevKeyOrder {
  def main(args: Array[String]): Unit =
    SparkEntry.queries.keys.zipWithIndex.foreach { case (k, i) =>
      println(f"$i%3d $k")
    }
}
