package graft.build

import java.util.concurrent.{Callable, ExecutionException, Executors}

import scala.jdk.CollectionConverters._

/** Driver-side overlap of INDEPENDENT Spark actions (guide §2.6): Spark's
  * scheduler happily runs several jobs at once inside one application —
  * actions are only sequential because driver code calls them sequentially.
  * The ingest paths maintain a dozen independent at-rest tables per batch;
  * submitting those writes from a small fixed pool lets the next table's
  * scan/derivation back-fill executor slots freed by the previous one's
  * tail, cutting the per-batch wall without changing any table's content
  * (each task is a self-contained write whose inputs are immutable or
  * pre-materialized).
  *
  * Failure mode: every task runs to completion or failure (no
  * cancellation), then the FIRST failure is rethrown — same observable
  * contract as the sequential loop, minus the ordering of which failure
  * surfaces when several fail. */
private[graft] object Par {

  def run(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    // 2-4 jobs in flight is plenty (guide §2.6): enough to fill scheduler
    // gaps, not so many that tiny local-mode stages fight for cores
    val pool = Executors.newFixedThreadPool(math.min(4, tasks.size))
    try {
      val futures = pool.invokeAll(
        tasks.map(t => new Callable[Unit] { def call(): Unit = t() }).asJava)
      futures.asScala.foreach { f =>
        try f.get()
        catch { case e: ExecutionException => throw e.getCause }
      }
    } finally {
      pool.shutdown()
      ()
    }
  }
}
