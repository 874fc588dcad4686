package graft

/** Every message along a throwable's cause chain, outermost first — the
  * shape assertions and driver rows need when an error crosses Spark's
  * task/driver wrapping layers.
  */
object Causes {
  def messages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
}
