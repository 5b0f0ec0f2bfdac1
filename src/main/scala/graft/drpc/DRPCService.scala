package graft.drpc

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

/** Failure of a DRPC request (timeout, worker failure, unknown function) —
  * the analog of the reference's `DRPCExecutionException`. */
final class DRPCExecutionException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Network-facing DRPC daemon around [[LocalDRPC]] — the service semantics
  * of the reference's DRPC server (`daemon/drpc.clj:48-123` + the thrift
  * surface `DRPCSpout.java:101-143`), re-hosted on the Spark driver:
  *
  *  - `execute(function, args)` BLOCKS the caller until a worker posts the
  *    result, the request times out, or it is failed — each request is
  *    isolated (own id + latch), so concurrent callers never see each
  *    other's results;
  *  - a BOUNDED request backlog (`maxQueueSize`, across all functions):
  *    when it is full, new requests are rejected immediately instead of
  *    growing the daemon without bound;
  *  - PER-FUNCTION sub-queues with round-robin dispatch — the fairness
  *    semantics of the reference's `KeyedFairBolt`
  *    (`drpc/KeyedFairBolt.java:93`, a `KeyedRoundRobinQueue` per key): a
  *    burst of one function's requests cannot starve another function; each
  *    worker cycle serves every non-empty function once. This also makes
  *    `fetchRequest(function)` O(1) (its own queue's head) instead of a
  *    linear walk of a shared queue;
  *  - `fetchRequest(function)` / `result(id, r)` / `failRequest(id)` — the
  *    worker-facing triple, usable manually (the topology-side contract) or
  *    driven by the built-in worker pool (`start`), which runs each request
  *    through the registered [[LocalDRPC]] pipeline;
  *  - a TIMEOUT LOOP sweeping requests older than `requestTimeoutMs` and
  *    failing them — a slow pipeline or a dead worker can't wedge callers.
  *
  * `startHttp()` exposes the same execute over HTTP/JSON (JDK HttpServer —
  * zero extra dependencies): `POST /drpc/<function>` with the args string
  * as body → the DRPC wire-format JSON result; 408 on timeout, 404 on
  * unknown function, 503 when the queue is full.
  *
  * Scale note: the daemon is driver-hosted control plane — each request
  * fans out as a normal Spark job over the cluster, so the data path is as
  * distributed as the registered pipeline; only request brokering is here.
  */
class DRPCService(drpc: LocalDRPC, requestTimeoutMs: Long = 10000L,
                  maxQueueSize: Int = 1024) {

  private final class Req(val id: String, val function: String, val args: String,
                          val enqueuedAtMs: Long) {
    val done = new CountDownLatch(1)
    // backlog accounting: whichever of poll / sweep dequeues first wins the
    // decrement (CLQ poll and iterator-remove can race on a dead entry)
    val dequeued = new AtomicBoolean(false)
    @volatile var outcome: Either[String, String] = Left("incomplete") // Left = failure reason
    def complete(o: Either[String, String]): Unit = { outcome = o; done.countDown() }
  }

  private val idGen = new AtomicLong(0L)
  private val queues = new ConcurrentHashMap[String, java.util.concurrent.ConcurrentLinkedQueue[Req]]()
  private val totalQueued = new java.util.concurrent.atomic.AtomicInteger(0)
  private val available = new java.util.concurrent.Semaphore(0)
  private val rrCursor = new AtomicLong(0L)
  private val pending = new ConcurrentHashMap[String, Req]()
  private val running = new AtomicBoolean(false)
  private var threads: Seq[Thread] = Nil
  @volatile private var http: Option[com.sun.net.httpserver.HttpServer] = None

  /** Blocking client call — enqueue and wait for result/failure/timeout.
    * FAST-registered functions (keyed lookups over a driver-held
    * [[StateIndex]]) short-circuit: they answer inline on the caller's
    * thread without touching the queue, so a full backlog of slow
    * pipeline requests can neither delay nor reject a `MapGet` — the
    * reference's interactive-latency contract survives overload. */
  def execute(function: String, args: String): String = {
    if (drpc.isFast(function)) {
      val fast =
        try drpc.tryFast(function, args)
        catch { case e: Throwable =>
          // keep the original as the cause: a fast fn's NPE would otherwise
          // surface as an undebuggable "failed: null" (code-review r14 #4)
          throw new DRPCExecutionException(
            s"DRPC fast request ($function) failed: ${e.getMessage}", e)
        }
      fast match {
        case Some(r) => return r
        case None => () // evicting-index cache miss: read through to the
                        // queued job path below (normal backlog discipline)
      }
    }
    if (totalQueued.get() >= maxQueueSize)
      throw new DRPCExecutionException(
        s"request queue full ($maxQueueSize) — rejecting ${function}")
    val req = new Req(idGen.incrementAndGet().toString, function, args,
      System.currentTimeMillis())
    pending.put(req.id, req)
    queues.computeIfAbsent(req.function, { _ =>
      val q = new java.util.concurrent.ConcurrentLinkedQueue[Req]()
      // refresh the dispatch snapshot only when a NEW function appears
      // (function sets are small and stable; per-fetch re-sorting isn't);
      // synchronized: two first-time functions hold different map bins
      this.synchronized { functionNames = (functionNames :+ req.function).sorted }
      q
    }).add(req)
    totalQueued.incrementAndGet()
    available.release()
    // the sweeper enforces the deadline; the latch slack covers sweep lag
    req.done.await(requestTimeoutMs * 2 + 1000, TimeUnit.MILLISECONDS)
    req.outcome match {
      case Right(r) => r
      case Left(reason) => throw new DRPCExecutionException(
        s"DRPC request ${req.id} ($function) failed: $reason")
    }
  }

  /** Head of one function's sub-queue, discarding entries already failed or
    * timed out (their ids are gone from `pending`). O(1) per live claim. */
  private def pollFunction(function: String): Option[Req] = {
    val q = queues.get(function)
    if (q == null) return None
    var r = q.poll()
    while (r != null) {
      if (r.dequeued.compareAndSet(false, true)) totalQueued.decrementAndGet()
      if (pending.containsKey(r.id)) return Some(r)
      r = q.poll()
    }
    None
  }

  /** Sorted snapshot of known function names; grows monotonically (a
    * function's queue lives for the service lifetime once seen). Updated
    * under the service lock on first sight of a function, read lock-free. */
  @volatile private var functionNames: Vector[String] = Vector.empty

  /** One round-robin sweep over the function sub-queues, starting one past
    * where the last sweep started — every non-empty function gets served
    * once per worker cycle (KeyedFairBolt semantics). */
  private def fetchAnyFair(): Option[Req] = {
    val names = functionNames
    if (names.isEmpty) return None
    val start = ((rrCursor.getAndIncrement() % names.length) + names.length) % names.length
    var i = 0
    while (i < names.length) {
      val found = pollFunction(names(((start + i) % names.length).toInt))
      if (found.isDefined) return found
      i += 1
    }
    None
  }

  /** Worker face: claim the oldest queued request for `function` (None when
    * none queued). O(1) — each function owns its sub-queue. */
  def fetchRequest(function: String): Option[(String, String)] =
    pollFunction(function).map { r =>
      available.tryAcquire() // best-effort sync for external (manual) drains
      (r.id, r.args)
    }

  /** Worker face: post a request's result. Posting to an already
    * timed-out/failed id is a no-op (the daemon's late-result behavior). */
  def result(id: String, res: String): Unit = {
    val r = pending.remove(id)
    if (r != null) r.complete(Right(res))
  }

  /** Worker face: fail a request (the caller's execute throws). */
  def failRequest(id: String, reason: String = "failed by worker"): Unit = {
    val r = pending.remove(id)
    if (r != null) r.complete(Left(reason))
  }

  def pendingCount: Int = pending.size()

  /** Live backlog across all function sub-queues. */
  def queuedCount: Int = totalQueued.get()

  /** Start `workers` pipeline threads (each drains the queue through the
    * registered LocalDRPC functions) plus the timeout sweeper. */
  def start(workers: Int = 2): DRPCService = {
    require(!running.getAndSet(true), "service already started")
    val ws = (0 until workers).map { i =>
      val t = new Thread(() => {
        while (running.get()) {
          if (available.tryAcquire(50, TimeUnit.MILLISECONDS)) {
            fetchAnyFair() match {
              case Some(req) =>
                try result(req.id, drpc.execute(req.function, req.args))
                catch {
                  case e: Throwable => failRequest(req.id, e.getMessage)
                }
              case None => () // permit belonged to an already-swept request
            }
          }
        }
      }, s"drpc-worker-$i")
      t.setDaemon(true); t.start(); t
    }
    val sweeper = new Thread(() => {
      while (running.get()) {
        val now = System.currentTimeMillis()
        pending.forEach { (id, r) =>
          if (now - r.enqueuedAtMs > requestTimeoutMs)
            failRequest(id, s"timed out after ${requestTimeoutMs}ms")
        }
        // drop swept requests still sitting in sub-queues so the backlog
        // bound reflects live work (claims also discard them lazily)
        queues.forEach { (_, q) =>
          val it = q.iterator()
          while (it.hasNext) {
            val r = it.next()
            if (!pending.containsKey(r.id)) {
              it.remove()
              if (r.dequeued.compareAndSet(false, true)) totalQueued.decrementAndGet()
            }
          }
        }
        Thread.sleep(math.max(10L, math.min(100L, requestTimeoutMs / 4)))
      }
    }, "drpc-timeout-sweeper")
    sweeper.setDaemon(true); sweeper.start()
    threads = ws :+ sweeper
    this
  }

  /** Expose execute over HTTP: `POST /drpc/<function>`, args = body.
    * Returns the bound port (pass 0 to pick a free one). */
  def startHttp(port: Int = 0): Int = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/drpc/", { exchange =>
      val function = exchange.getRequestURI.getPath.stripPrefix("/drpc/")
      val args = new String(exchange.getRequestBody.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      val (code, body) =
        try (200, execute(function, args))
        catch {
          case e: DRPCExecutionException =>
            val msg = Option(e.getMessage).getOrElse("")
            if (msg.contains("unknown DRPC function")) (404, msg)
            else if (msg.contains("queue full")) (503, msg)
            else if (msg.contains("timed out")) (408, msg)
            else (500, msg)
          case e: Throwable => (500, String.valueOf(e.getMessage))
        }
      val bytes = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(code, bytes.length)
      val os = exchange.getResponseBody
      os.write(bytes); os.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    http = Some(server)
    server.getAddress.getPort
  }

  def stop(): Unit = {
    running.set(false)
    http.foreach(_.stop(0))
    http = None
    // release any still-blocked callers
    pending.forEach((id, _) => failRequest(id, "service stopped"))
  }
}
