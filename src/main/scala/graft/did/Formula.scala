package graft.did

/** R-style formula parsing.
  *
  * Semantics per reference `csdids/utils.py:11-18` (`xform_to_strings`):
  * `'y ~ x1 + x2 + 1'` -> covariate column names, with `1` mapped to the
  * synthesized `_intercept` column; a missing formula means intercept-only.
  */
object Formula {
  val InterceptCol = "_intercept"

  def covariateNames(fmla: Option[String]): Seq[String] = fmla match {
    case None => Seq(InterceptCol)
    case Some(f) =>
      val parts = f.split("~")
      require(parts.length == 2, s"formula must contain exactly one '~': $f")
      parts(1).trim.split("\\+").map(_.trim).filter(_.nonEmpty)
        .map(x => if (x == "1") InterceptCol else x).toSeq
  }

  /** True when the covariate set is intercept-only (the distributed
    * closed-form estimation path applies). */
  def interceptOnly(fmla: Option[String]): Boolean =
    covariateNames(fmla) == Seq(InterceptCol)
}
