package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import Geocoder._

class GeocoderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("geocode: one row per provider, failures and empties captured inline") {
    import spark.implicits._
    val reqs = Seq(
      GeocodeRequest("RX1", "AB1 2CD", "Trust A"),
      GeocodeRequest("RX2", "", "Trust B"),      // null-postcode path
      GeocodeRequest("RX3", "BOOM", "Trust C")).toDS()
    val throwing = new GeocodeClient {
      val fake = new FakeClient
      def lookup(r: GeocodeRequest): GeocodeResult =
        if (r.postcode == "BOOM") throw new RuntimeException("quota exceeded")
        else fake.lookup(r)
    }
    val out = Geocoder.geocode(reqs, throwing).collect()
      .map(r => r.code -> r).toMap
    assert(out.size == 3)
    assert(out("RX1").status == "OK" && out("RX1").number_results == 1)
    assert(out("RX2").status == "ZERO_RESULTS")
    assert(out("RX3").status.startsWith("FAIL: quota exceeded"))
    // deterministic across runs
    val again = Geocoder.geocode(reqs, throwing).collect()
      .map(r => r.code -> r.lat).toMap
    assert(out("RX1").lat == again("RX1"))
  }
}
