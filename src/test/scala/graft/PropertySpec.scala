package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{HashingStubClient, LlmClient}
import graft.ops.AnnIndex

/** Property-based invariants (SURVEY.md §5): totality of the enrichment
  * function, hash/fingerprint domains, LSH component soundness. Raw
  * ScalaCheck driven from ScalaTest (no scalatestplus bridge in the
  * offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("enrichment is total: any input yields three valid fields") {
    check(Prop.forAll(Gen.option(Gen.asciiPrintableStr), Gen.option(Gen.asciiPrintableStr)) {
      (t, c) =>
        val r = HashingStubClient.enrich(t.orNull, c.orNull)
        r.sentiment != null && r.category != null && r.summary != null &&
          Set("Positive", "Negative", "Neutral").contains(r.sentiment)
    })
  }

  test("enrichment is deterministic") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (t, c) =>
      HashingStubClient.enrich(t, c) == HashingStubClient.enrich(t, c)
    })
  }

  test("h60 native expression is bit-identical to the hex-chain reference") {
    val unicodeish = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(Gen.alphaNumChar.map(_.toString),
          Gen.oneOf("é", "ß", "中", "🎈", " ")))
        .map(_.mkString))
    check(Prop.forAll(unicodeish) { s =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) ==
        graft.functions.H60Expr.hash(
          org.apache.spark.unsafe.types.UTF8String.fromString(s))
    })
  }

  test("LSH plane components are ±1 and deterministic") {
    check(Prop.forAll(Gen.choose(0, 63), Gen.choose(0, 255)) { (p, d) =>
      val v = AnnIndex.planeComponent(p, d)
      (v == 1 || v == -1) && v == AnnIndex.planeComponent(p, d)
    })
  }

  test("LSH planes are not degenerate (both signs occur per plane)") {
    for (p <- 0 until 8) {
      val comps = (0 until 64).map(AnnIndex.planeComponent(p, _))
      assert(comps.contains(1) && comps.contains(-1))
    }
  }

  private def rollingHash(s: String): Long =
    graft.functions.RollingHashExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(s))
      .eval(null).asInstanceOf[Long]

  test("rolling hash stays in [0, 1e9+7), is deterministic, extends") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val h = rollingHash(s)
      h >= 0L && h < 1000000007L && h == rollingHash(s)
    })
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      // last-byte sensitivity: (31h+'x') and (31h+'y') differ by 1 mod M
      rollingHash(s + "x") != rollingHash(s + "y")
    })
  }

  test("prompt always embeds the full category contract") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (t, c) =>
      val p = LlmClient.promptFor(t, c)
      graft.schema.Schemas.categoriesToKeep.forall(p.contains)
    })
  }

  // --- deterministic-sketch math (q137/q138 KMV, q140 count-min) ---

  private def kmvKmin(hs: Set[Long], k: Int): Vector[Long] =
    hs.toVector.sorted.take(k)

  test("KMV sketches merge losslessly: k-min of the union == k-min of merged sketches") {
    // the mergeability theorem q138 relies on: any hash among the k
    // smallest of A ∪ B is among the k smallest of the side it came from
    val genHashes = Gen.listOf(Gen.choose(0L, (1L << 50) - 1)).map(_.toSet)
    check(Prop.forAll(genHashes, genHashes) { (a, b) =>
      val k = 16
      kmvKmin(a ++ b, k) == kmvKmin(kmvKmin(a, k).toSet ++ kmvKmin(b, k).toSet, k)
    })
  }

  test("KMV estimate is exact below k and positive-bounded above it") {
    val k = 16
    def est(hs: Set[Long]): Long =
      if (hs.size < k) hs.size.toLong
      else (k - 1).toLong * (1L << 50) / kmvKmin(hs, k).last
    check(Prop.forAll(Gen.listOf(Gen.choose(0L, (1L << 50) - 1)).map(_.toSet)) { hs =>
      if (hs.size < k) est(hs) == hs.size.toLong
      else est(hs) >= 1L // kth min >= k-1 >= 1 for distinct non-negative hashes
    })
  }

  test("count-min never undercounts, on the real seeded h60 hash") {
    val (d, w) = (4, 64)
    def bucket(i: Int, x: String): Int =
      (graft.functions.H60Expr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s"cm$i:" + x)) % w).toInt
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.oneOf(
      (0 until 40).map(n => s"tok$n")))) { items =>
      val counters = Array.ofDim[Long](d, w)
      items.foreach(x => (0 until d).foreach(i => counters(i)(bucket(i, x)) += 1))
      val exact = items.groupBy(identity).map { case (x, xs) => x -> xs.length.toLong }
      exact.forall { case (x, n) =>
        (0 until d).map(i => counters(i)(bucket(i, x))).min >= n
      }
    })
  }

  test("count_in equals the declarative filter-count, nulls never match") {
    val members = Seq("the", "a")
    val set = graft.functions.CountInExpr.buildSet(members.toArray)
    check(Prop.forAll(Gen.listOf(Gen.oneOf("the", "a", "x", "yy", ""))) { ws =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      graft.functions.CountInExpr.compute(arr, set) ==
        ws.count(members.contains).toLong
    })
    val withNull = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString("the"), null))
    assert(graft.functions.CountInExpr.compute(withNull, set) == 1L)
  }

  test("q148's windowed-sum EWMA equals the bias-corrected sequential fold") {
    // The query's closed form (num_t = Σ_{j=0..L} x_{t-j}·2^(19-j),
    // den_t = 2^20 − 2^(19-L)) must equal the zero-initialized
    // sequential recurrence f_t = (x_t + f_{t-1})/2 over the same
    // 20-lag window, debiased by its weight mass 1 − 2^-(L+1) (the
    // Adam-style correction that makes early-series values unbiased).
    // Proves the algebraic rewrite that turns an order-dependent fold
    // into a parallel window sum. All arithmetic exact: the fold only
    // divides by 2 (terminating in BigDecimal) and equality is checked
    // by cross-multiplication, never a non-terminating division.
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, 100000L))) { xs =>
      val series = xs.take(64)
      series.indices.forall { t =>
        val l = math.min(19, t)
        val num = (0 to l).map(j => series(t - j) * (1L << (19 - j))).sum
        val den = (1L << 20) - (1L << (19 - l))
        val fold = ((t - l) to t).foldLeft(BigDecimal(0)) { (e, i) =>
          (BigDecimal(series(i)) + e) / 2
        }
        val bias = BigDecimal(1) - BigDecimal(1) / BigDecimal(2).pow(l + 1)
        // num/den == fold/bias ⟺ num·bias == den·fold
        BigDecimal(num) * bias == BigDecimal(den) * fold
      }
    })
  }
}
