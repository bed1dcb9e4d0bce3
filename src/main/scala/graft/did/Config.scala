package graft.did

/** Configuration for the ATT(g,t) estimator — the engine's analogue of the
  * reference constructor arguments (`csdids/ATTgt.py:22-27`).
  *
  * Column roles are runtime strings (schema-dynamic input), so the input
  * stays a `DataFrame`; results are typed (`AttGtCell`, `AggteResult`).
  *
  * `controlGroup` takes the head of the reference's list default
  * (`['nevertreated','notyettreated'][0]`).
  */
final case class AttGtConfig(
    yname: String,
    tname: String,
    idname: String,
    gname: String,
    controlGroup: String = "nevertreated",
    xfmla: Option[String] = None,
    panel: Boolean = true,
    allowUnbalancedPanel: Boolean = true,
    clustervar: Option[String] = None,
    weightsName: Option[String] = None,
    anticipation: Int = 0,
    cband: Boolean = false,
    biters: Int = 1000,
    alp: Double = 0.05,
    seed: Long = 42L) {
  require(controlGroup == "nevertreated" || controlGroup == "notyettreated",
    s"controlGroup must be 'nevertreated' or 'notyettreated', got $controlGroup")
  def covariates: Seq[String] = Formula.covariateNames(xfmla)
  def interceptOnly: Boolean = Formula.interceptOnly(xfmla)
}

/** One ATT(g,t) cell of the result surface (`csdids/ATTgt.py:490-500`).
  * Unlike the reference output dict, `lower`/`upper` carry the correct
  * orientation (the reference swaps them — SURVEY.md §7.5b). */
final case class AttGtCell(
    group: Double,
    time: Double,
    att: Double,
    post: Int,
    se: Double,
    critVal: Double,
    lower: Double,
    upper: Double,
    sig: Boolean,
    skipped: Boolean)

/** Aggregated-effects result — the engine's `AGGTEobj`
  * (`csdids/utils_aggte.py:69-96`). `egt`/`attEgt`/`seEgt` are empty for
  * `typec = "simple"`. */
final case class AggteResult(
    typec: String,
    overallAtt: Double,
    overallSe: Double,
    egt: Seq[Double],
    attEgt: Seq[Double],
    seEgt: Seq[Double],
    critValEgt: Double,
    alp: Double) {
  def overallLower: Double = overallAtt - Stats.normPpf(1 - alp / 2) * overallSe
  def overallUpper: Double = overallAtt + Stats.normPpf(1 - alp / 2) * overallSe
}
