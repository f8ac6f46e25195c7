package graft.util

/** The one shared fan-out helper for driver-side concurrency over
  * blocking work (Spark actions, file-lock commits): previously three
  * sites inlined the identical Future.sequence + blocking + Await
  * scaffolding, and any fix would have had to land three times. */
object Par {

  /** Map `f` over `xs` concurrently on the global pool. Each invocation
    * is wrapped in `blocking(...)` because the work spends its life
    * inside a blocking call (a Spark action, an fsync, a lock wait) —
    * without the marker the global pool's #cores threads serialize the
    * tail on small machines. Failures propagate out of the Await;
    * callers rely on nothing becoming visible until they commit the
    * returned results. */
  def blockingMap[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(
      Future.sequence(xs.map(a => Future(scala.concurrent.blocking(f(a))))),
      Duration.Inf)
  }
}
