package graft.pipeline

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/** HTTP implementations of the Orchestrator's `probe`/`download` hooks
  * (reference src/lambda_functions/data_downloader.py:13-42 and
  * fetch_raw_data.py:35-53): availability is an HTTP HEAD, and the payload
  * is STREAMED to disk — `BodyHandlers.ofFile` writes the response body
  * chunk-by-chunk, so a multi-GB month never materializes in heap, same as
  * the reference's `iter_content`/multipart streaming upload.
  *
  * The hooks stay plain `String => *` functions, so tests keep injecting
  * local fixtures (or a loopback HTTP server, as PipelineSpec does) and the
  * Orchestrator never learns the transport.
  */
final class HttpSource(
    urlFor: String => String,
    tmpDir: Path,
    timeout: Duration = Duration.ofSeconds(30)) {

  private val client = HttpClient.newBuilder()
    .followRedirects(HttpClient.Redirect.NORMAL)
    .connectTimeout(timeout)
    .build()

  /** Month availability = HEAD returns 2xx. Connection errors mean "not
    * published yet", not failure — the probe window just moves on, exactly
    * like the reference treating a 403/404 as absence.
    */
  def probe(yearMonth: String): Boolean =
    try {
      val req = HttpRequest.newBuilder(URI.create(urlFor(yearMonth)))
        .method("HEAD", HttpRequest.BodyPublishers.noBody())
        .timeout(timeout)
        .build()
      val status = client.send(req, HttpResponse.BodyHandlers.discarding())
        .statusCode()
      status >= 200 && status < 300
    } catch {
      case _: java.io.IOException => false
      case _: InterruptedException =>
        // Preserve cancellation: the probe loop's caller must see the
        // interrupt, not a "month not published" answer.
        Thread.currentThread().interrupt()
        false
    }

  /** Streaming GET into a temp file; the caller (Ingest.ingestFile) moves
    * it into the bronze key layout. Non-2xx raises — a month that probed
    * available but fails to download must surface, not silently skip.
    */
  def download(yearMonth: String): String = {
    val req = HttpRequest.newBuilder(URI.create(urlFor(yearMonth)))
      .GET()
      .timeout(timeout)
      .build()
    val dst = Files.createTempFile(tmpDir, s"download_$yearMonth", ".part")
    try {
      val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(dst))
      if (resp.statusCode() < 200 || resp.statusCode() >= 300)
        throw new java.io.IOException(
          s"GET ${urlFor(yearMonth)} -> HTTP ${resp.statusCode()}")
      dst.toString
    } catch {
      // Mid-transfer failures (reset, timeout) also must not leave a
      // partial .part file behind — retries would accumulate them.
      case e: Throwable => Files.deleteIfExists(dst); throw e
    }
  }
}
