package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties (SURVEY.md §5.2): cosine kernel algebra at the
  * expression level (no Spark jobs — direct eval), and exactness of the
  * Det.moneySum grid-snap aggregation against BigDecimal arithmetic.
  */
object PropertiesSpec extends Properties("graft") {

  private def cos(a: Array[Float], b: Array[Float]): Double =
    graft.functions.CosineSimilarity(
      Literal.create(new GenericArrayData(a), ArrayType(FloatType)),
      Literal.create(new GenericArrayData(b), ArrayType(FloatType)))
      .eval(null).asInstanceOf[Double]

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](16, Gen.choose(-100f, 100f))
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3f))

  property("cosine bounded and symmetric") = Prop.forAll(vecGen, vecGen) {
    (a, b) =>
      val s = cos(a, b)
      s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9 && cos(b, a) == s
  }

  property("cosine self = 1, negation = -1") = Prop.forAll(vecGen) { a =>
    math.abs(cos(a, a) - 1.0) < 1e-9 &&
      math.abs(cos(a, a.map(-_)) + 1.0) < 1e-9
  }

  property("cosine scale-invariant") =
    Prop.forAll(vecGen, Gen.choose(0.1f, 50f)) { (a, k) =>
      math.abs(cos(a, a.map(_ * k)) - 1.0) < 1e-6
    }

  property("moneySum exact vs BigDecimal") = {
    import org.apache.spark.sql.functions._
    val spark = SparkTestBase.spark
    import spark.implicits._
    val centsGen = Gen.listOfN(200, Gen.choose(1L, 10000000L))
    Prop.forAllNoShrink(centsGen) { cents =>
      cents.isEmpty || {
        val amounts = cents.map(c => BigDecimal(c) / 100)
        val expected = amounts.sum.toDouble
        val got = amounts.map(_.toDouble).toDF("x")
          .agg(Det.moneySum(col("x")).as("s")).head.getDouble(0)
        got == expected
      }
    }
  }

  property("sliding_windows generator: coverage, bounds, overlap") = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val paramGen = for {
      n <- Gen.choose(1, 200)
      k <- Gen.choose(1, 50)
      s <- Gen.choose(1, k)
    } yield (n, k, s)
    Prop.forAllNoShrink(paramGen) { case (n, k, s) =>
      val arr = (0L until n.toLong).toArray
      val rows = graft.functions.SlidingWindows(
        Literal.create(new GenericArrayData(arr), ArrayType(LongType)),
        Literal(k), Literal(s))
        .eval(null).iterator.toSeq
      val wins = rows.map(r =>
        r.getArray(1).toLongArray().toSeq)
      val ids = rows.map(_.getInt(0))
      // ids are 0..m-1; windows at stride s; sizes within (0, k];
      // concatenated coverage is exactly 0..n-1 with (m-1)*(k-s) overlap
      ids == ids.indices &&
        wins.forall(w => w.nonEmpty && w.size <= k) &&
        wins.flatten.toSet == arr.toSet &&
        wins.map(_.size).sum == n + (wins.size - 1) * (k - s) &&
        wins.zipWithIndex.forall { case (w, i) => w.head == i.toLong * s }
    }
  }

  property("rolling-hash fold matches reference") = {
    val M = 1000000007L
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % M)
    import org.apache.spark.sql.functions._
    val spark = SparkTestBase.spark
    import spark.implicits._
    Prop.forAllNoShrink(
      Gen.listOfN(10, Gen.alphaNumStr.suchThat(_.nonEmpty))) { texts =>
      texts.isEmpty || {
        val got = texts.toDF("text")
          .select(aggregate(transform(split(col("text"), ""),
            c => ascii(c).cast("long")),
            lit(0L), (acc, x) => (acc * 31L + x) % M).as("h"))
          .collect().map(_.getLong(0)).toSeq
        got == texts.map(ref)
      }
    }
  }

  /** The z-order interleave used by sink_zorder_write: bijective on the
    * 8-bit × 8-bit grid, and contiguous z-ranges have bounded 2-D extent
    * (the property file-level min/max skipping relies on).
    */
  property("morton interleave is a bijection on the 256x256 grid") = {
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i =>
        (((x % 256) >> i & 1L) << (2 * i)) |
          (((y % 256) >> i & 1L) << (2 * i + 1))).reduce(_ | _)
    val coord = Gen.choose(0L, 255L)
    Prop.forAll(coord, coord, coord, coord) { (x1, y1, x2, y2) =>
      val same = (x1 == x2) && (y1 == y2)
      (morton(x1, y1) == morton(x2, y2)) == same &&
        morton(x1, y1) >= 0 && morton(x1, y1) < 65536
    }
  }

  property("LCG id hash: stable, in-range, and overflow-free for any long") = {
    def h(id: Long): Long =
      ((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { id =>
      val v = h(id)
      // stays below 2^61 pre-mod (no silent wrap), result in [0, 2^31)
      (id % 2147483648L) * 1103515245L + 12345L > 0 &&
        v >= 0 && v < 2147483648L && h(id) == v
    }
  }

  /** The PPJoin prefix-filter recall LEMMA (Bayardo/Xiao), which is what
    * makes llm_dedup_near's oracle equality corpus-independent since r7:
    * under ANY total order, two sets with J(A,B) >= τ must share an
    * element within each side's first |X| - ceil(τ·|X|) + 1 elements.
    * The Spark plumbing is oracle-verified on the fixtures; this pins
    * the math on arbitrary random set pairs (shared pool forces real
    * overlap so the J >= τ branch is exercised, not vacuous) at the
    * shipped thresholds. A pure-Scala mirror of
    * DedupVariants.ngramCandidates' slice(array_sort(shs), 1, L).
    */
  property("PPJoin prefix lemma: J >= tau implies prefix intersection") = {
    val poolGen = for {
      poolSize <- Gen.choose(10, 40)
      pool <- Gen.containerOfN[Set, Long](poolSize, Gen.choose(Long.MinValue, Long.MaxValue))
      aN <- Gen.choose(3, pool.size)
      bN <- Gen.choose(3, pool.size)
      a <- Gen.pick(aN, pool)
      b <- Gen.pick(bN, pool)
    } yield (a.toSet, b.toSet)
    val tauGen = Gen.oneOf(0.5, 0.6, 0.8)
    Prop.forAll(poolGen, tauGen) { case ((a, b), tau) =>
      val inter = (a & b).size.toDouble
      val j = inter / (a.size + b.size - inter)
      def prefix(x: Set[Long]): Set[Long] = {
        val l = x.size - math.ceil(tau * x.size).toInt + 1
        x.toSeq.sorted.take(l).toSet
      }
      j < tau || (prefix(a) & prefix(b)).nonEmpty
    }
  }
}
