package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class PiiScrubSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrubOne(s: String): (String, Map[String, Long]) = {
    val df = Seq(s).toDF("t")
    val counts = PiiScrub.detect(col("t"))
    val row = df.select(
      PiiScrub.redact(col("t")).as("red") +: counts.map { case (n, c) => c.as(n) }: _*)
      .head()
    (row.getString(0),
      counts.map { case (n, _) => n -> row.getAs[Long](n) }.toMap)
  }

  test("each default rule fires on its target and leaves the rest alone") {
    val (red, n) = scrubOne(
      "mail a.b+c@ex-ample.org then ping 192.168.0.1 or call 555-123-4567 ok")
    assert(red == "mail <EMAIL> then ping <IP> or call <PHONE> ok")
    assert(n == Map("email" -> 1L, "ipv4" -> 1L, "phone" -> 1L))
  }

  test("all occurrences are replaced, not just the first") {
    val (red, n) = scrubOne("a@b.co c@d.io and 1.2.3.4 5.6.7.8")
    assert(red == "<EMAIL> <EMAIL> and <IP> <IP>")
    assert(n("email") == 2L && n("ipv4") == 2L)
  }

  test("rule order protects the email's digits from the ip/phone rules") {
    // a digit-heavy local part that the phone rule could otherwise bite
    val (red, _) = scrubOne("555-123-4567@example.com")
    assert(red == "<EMAIL>")
  }

  test("clean text passes through untouched with zero counts") {
    val (red, n) = scrubOne("no identifiers here at all")
    assert(red == "no identifiers here at all")
    assert(n.values.forall(_ == 0L))
  }

  test("randomized: plant k of each identifier — detect exactly k, redacted text re-detects zero") {
    val rnd = new scala.util.Random(11)
    def word = Seq.fill(3 + rnd.nextInt(5))(('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (1 to 80).map { _ =>
      val (ke, ki, kp) = (rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3))
      val pii =
        Seq.fill(ke)(s"$word${rnd.nextInt(100)}@$word.com") ++
          Seq.fill(ki)(
            s"${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}.${rnd.nextInt(256)}") ++
          Seq.fill(kp)(
            f"${rnd.nextInt(1000)}%03d-${rnd.nextInt(1000)}%03d-${rnd.nextInt(10000)}%04d")
      (rnd.shuffle(Seq.fill(10)(word) ++ pii).mkString(" "), ke, ki, kp)
    }
    val df = rows.toDF("t", "ke", "ki", "kp")
    val counts = PiiScrub.detect(col("t")).toMap
    val redCounts = PiiScrub.detect(PiiScrub.redact(col("t")))
    val got = df.select(
      col("ke"), col("ki"), col("kp"),
      counts("email").as("ne"), counts("ipv4").as("ni"), counts("phone").as("np"),
      redCounts.map(_._2).reduce(_ + _).as("residual")).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("ne") == r.getAs[Int]("ke").toLong)
      assert(r.getAs[Long]("ni") == r.getAs[Int]("ki").toLong)
      assert(r.getAs[Long]("np") == r.getAs[Int]("kp").toLong)
      assert(r.getAs[Long]("residual") == 0L)
    }
  }
}
