package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.time.Duration
import java.util.concurrent.{Callable, Executors}
import scala.jdk.CollectionConverters._

/** Parallel ranged-HTTP download — EP1's actual byte-mover (reference
  * io.py:153-382 `OptimizedDownloader`): HEAD for the content length,
  * split into byte ranges ([[Ingest.splitChunks]]), bounded-concurrency
  * ranged GETs with exponential-backoff retries (io.py:216,274), ordered
  * reassembly, then a streaming checksum of the combined file
  * (io.py:364-369). Servers without range support (no usable HEAD /
  * content-length, or a 200 answer to a ranged request) fall back to one
  * sequential GET — same behavior, one stream.
  *
  * This is driver-side transport by design, exactly like the reference:
  * the DOWNLOAD is one node's work (a dump is one file on one HTTP
  * server); the parallelism that matters at cluster scale happens after
  * the bytes land (distributed parse of the landed file). Concurrency
  * here is the reference's semaphore — a fixed worker pool.
  */
object RangedHttp {

  final case class Fetched(path: String, bytes: Long, nChunks: Int, checksum: String)

  /** Thrown (and never retried) when the server answers 200 to a ranged
    * request — ranges unsupported, restart sequentially. */
  private final class RangeUnsupported extends RuntimeException("server ignores Range")

  def fetch(url: String, outPath: String,
      maxWorkers: Int = 8,
      chunkSize: Long = 8L * 1024 * 1024,
      minChunk: Long = 1L * 1024 * 1024,
      maxRetries: Int = 5, // reference default, io.py:160
      backoffMs: Long = 1000L,
      connectTimeoutSec: Int = 30,
      algo: String = "SHA-256"): Fetched = {
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .connectTimeout(Duration.ofSeconds(connectTimeoutSec))
      .build()

    def withRetries[A](what: String)(op: => A): A = {
      var attempt = 0
      var out: Option[A] = None
      while (out.isEmpty) {
        try out = Some(op)
        catch {
          case e: RangeUnsupported => throw e
          case _: Exception if attempt < maxRetries - 1 =>
            Thread.sleep(backoffMs << attempt) // 2^attempt exponential backoff
            attempt += 1
          case e: Exception =>
            throw new RuntimeException(s"$what failed after $maxRetries attempts", e)
        }
      }
      out.get
    }

    val out = Paths.get(outPath)
    Option(out.getParent).foreach(Files.createDirectories(_))

    def sequentialGet(): Int = {
      withRetries(s"GET $url") {
        val r = client.send(HttpRequest.newBuilder(URI.create(url)).GET().build(),
          HttpResponse.BodyHandlers.ofFile(out))
        if (r.statusCode() / 100 != 2)
          throw new RuntimeException(s"GET status ${r.statusCode()}")
      }
      1
    }

    // Size probe; any failure here just routes to the sequential path.
    val sizeOpt =
      try Some(withRetries(s"HEAD $url") {
        val r = client.send(HttpRequest.newBuilder(URI.create(url))
          .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
          HttpResponse.BodyHandlers.discarding())
        if (r.statusCode() != 200) throw new RuntimeException(s"HEAD status ${r.statusCode()}")
        r.headers().firstValueAsLong("content-length").orElse(-1L)
      }).filter(_ > 0)
      catch { case _: Exception => None }

    val nChunks = sizeOpt match {
      case None => sequentialGet()
      case Some(total) =>
        val chunks = Ingest.splitChunks(total, maxWorkers, chunkSize, minChunk)
        val tmpDir = Files.createTempDirectory(
          Option(out.getParent).getOrElse(Paths.get(".")), s".${out.getFileName}_chunks_")
        val pool = Executors.newFixedThreadPool(math.max(1, math.min(maxWorkers, chunks.size)))
        try {
          val tasks: Seq[Callable[(Long, Path)]] = chunks.map { case (start, end) =>
            () => withRetries(s"GET $url bytes=$start-$end") {
              val chunkFile = tmpDir.resolve(s"chunk_$start")
              val r = client.send(HttpRequest.newBuilder(URI.create(url))
                .header("Range", s"bytes=$start-$end").GET().build(),
                HttpResponse.BodyHandlers.ofFile(chunkFile))
              if (r.statusCode() == 200) throw new RangeUnsupported
              if (r.statusCode() != 206)
                throw new RuntimeException(s"ranged GET status ${r.statusCode()}")
              val len = Files.size(chunkFile)
              if (len != end - start + 1)
                throw new RuntimeException(s"short chunk: got $len, want ${end - start + 1}")
              (start, chunkFile)
            }
          }
          val fetched =
            try pool.invokeAll(tasks.asJava).asScala.map(_.get()).toSeq
            catch {
              case e: java.util.concurrent.ExecutionException
                  if e.getCause.isInstanceOf[RangeUnsupported] =>
                Seq.empty // fall through to sequential below
            }
          if (fetched.isEmpty) sequentialGet()
          else {
            val os = Files.newOutputStream(out)
            try fetched.sortBy(_._1).foreach { case (_, f) => Files.copy(f, os) }
            finally os.close()
            chunks.size
          }
        } finally {
          pool.shutdownNow()
          Files.walk(tmpDir).iterator().asScala.toSeq.reverse.foreach(p =>
            try Files.deleteIfExists(p) catch { case _: Exception => () })
        }
    }
    Fetched(outPath, Files.size(out), nChunks, Ingest.checksumFile(outPath, algo))
  }
}
