package graft.tools

/** Smoke-check for the bench stdout chain: prints one JSON line exactly
  * the way [[graft.Bench]] prints its compact contract line. Run
  * `sbt -batch "runMain graft.tools.EmitCheck"` and assert the LAST line
  * of captured stdout parses as JSON — i.e. no sbt `[info] ` prefix
  * (run / outputStrategy := StdoutOutput) and no trailing
  * `[success] Total time...` banner (Global / showSuccess := false).
  * Rounds 1-3 shipped `parsed: null` bench artifacts to exactly these
  * two pieces of log decoration.
  */
object EmitCheck {
  def main(args: Array[String]): Unit = {
    println("""{"metric":"emit_check","value":1,"unit":"ok"}""")
  }
}
