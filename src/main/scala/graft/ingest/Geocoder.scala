package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset}

/** S6 — REST geocoding enrichment (`1c. Look for provider
  * locations.R:139-216, 260-345`): the reference calls a places API
  * per provider, capturing failures as explicit "fail" rows rather
  * than aborting (`search_postcode_google_catch`).
  *
  * Spark shape: `mapPartitions` over the (small) provider dimension —
  * one client per partition, bounded fan-out, every row produces
  * exactly one result row with `status` either "OK"/"ZERO_RESULTS" or
  * the failure message. The HTTP client sits behind [[GeocodeClient]]
  * so tests (and this zero-egress environment) inject a deterministic
  * fake; a real implementation is a drop-in.
  */
object Geocoder {

  final case class GeocodeRequest(code: String, postcode: String, name: String)

  final case class GeocodeResult(code: String, postcode: String,
      status: String, number_results: Int, lat: Double, lon: Double,
      address: String)

  /** The stubbed service boundary: implementations may do real HTTP;
    * MUST be total (capture errors in the result, don't throw). */
  trait GeocodeClient extends Serializable {
    def lookup(req: GeocodeRequest): GeocodeResult
  }

  /** Deterministic offline fake: hashes the postcode into a plausible
    * UK-ish coordinate; empty postcode -> ZERO_RESULTS (the
    * reference's null-postcode path, `1c.:133-135`). */
  final class FakeClient extends GeocodeClient {
    def lookup(r: GeocodeRequest): GeocodeResult =
      if (r.postcode == null || r.postcode.trim.isEmpty)
        GeocodeResult(r.code, r.postcode, "ZERO_RESULTS", 0, Double.NaN,
          Double.NaN, null)
      else {
        val h = r.postcode.hashCode
        GeocodeResult(r.code, r.postcode, "OK", 1,
          50.0 + math.abs(h % 1000) / 100.0,
          -5.0 + math.abs((h / 1000) % 1000) / 100.0,
          s"${r.name}, ${r.postcode}")
      }
  }

  /** Wraps a client so ANY thrown error becomes a "fail" row — the
    * `_catch` semantics of the reference. */
  final class CatchingClient(inner: GeocodeClient) extends GeocodeClient {
    def lookup(r: GeocodeRequest): GeocodeResult =
      try inner.lookup(r)
      catch {
        case e: Exception =>
          GeocodeResult(r.code, r.postcode, s"FAIL: ${e.getMessage}", 0,
            Double.NaN, Double.NaN, null)
      }
  }

  /** Enrich a provider dimension with geocodes. Partition-local client
    * lifecycle; one output row per input row, failures inline. */
  def geocode(providers: Dataset[GeocodeRequest], client: GeocodeClient)
      : Dataset[GeocodeResult] = {
    import providers.sparkSession.implicits._
    val catching = new CatchingClient(client)
    providers.mapPartitions(_.map(catching.lookup))
  }
}
