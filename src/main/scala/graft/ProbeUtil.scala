package graft

/** Shared probe math — ONE definition of the ladder work-accounting
  * formulas and the deterministic gaussian corpus generator, so
  * RecallProbe and Round12Probe (which re-runs the r12 blocks alone at
  * any SF) cannot drift: a fix to the accounting or the generator that
  * landed in only one file would silently invalidate the other's §7
  * tables. */
object ProbeUtil {

  /** Per-rung cost telemetry of an escalateRounds ladder. work =
    * Σ width·pending over rungs; final_work = Σ (each query's final
    * width) — the one-shot cost had the right width been known;
    * work_multiple = work/final_work (the 4/3 geometric ceiling holds
    * while each rung quadruples — a cap-clamped last rung breaks the
    * assumption, see §7-probes-r12); vs_exhaustive = work/(cap·|batch|),
    * the single-shot exhaustive backstop. */
  def ladderLine(family: String, config: String,
                 rungs: Seq[(Int, Int)], cap: Long, recall: Double): Unit = {
    val work = rungs.map { case (w, p) => w.toLong * p }.sum
    val finals = rungs.zipWithIndex.map { case ((w, p), i) =>
      val nxt = if (i + 1 < rungs.length) rungs(i + 1)._2 else 0
      w.toLong * (p - nxt)
    }.sum
    val exhaustive = cap * rungs.head._2
    println(f"""{"family":"$family","config":"$config","rungs":${rungs.length},"rung_widths":"${rungs.map(r => r._1 + "x" + r._2).mkString(",")}","work":$work,"final_work":$finals,"work_multiple":${work.toDouble / math.max(finals, 1)}%.3f,"vs_exhaustive":${work.toDouble / exhaustive}%.4f,"recall":$recall%.4f}""")
  }

  /** Hash-seeded standard normal (Box-Muller over two xxhash64 draws)
    * as a SQL fragment — no RNG state, identical across runs and
    * partitionings. `j` is the in-scope transform() lambda variable. */
  def gauss(key: String, salt: Int): String =
    s"sqrt(-2.0 * ln((pmod(xxhash64($key, j, $salt), 1000000) + 0.5) / 1000000.0)) * " +
    s"cos(6.283185307179586 * (pmod(xxhash64($key, j, ${salt + 1}), 1000000) + 0.5) / 1000000.0)"

  /** Element expression for the synthetic sweep corpora: 64 gaussian
    * centers with sigma·unit spread around each (the shape real
    * embedding models produce), or the isotropic worst case when
    * sigma < 0 (neighbors barely beat random pairs at any dim). */
  def mixtureExpr(sigma: Double): String =
    if (sigma < 0) gauss("id", 1)
    else s"${gauss("pmod(id, 64)", 11)} + $sigma * ${gauss("id", 1)}"
}
