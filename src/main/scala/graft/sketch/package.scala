package graft

package object sketch {
  /** Deterministic tie-break ordering for sketch keys: numeric keys compare
   * numerically, strings lexically (matches the SQL oracle's
   * `ORDER BY cnt DESC, key ASC`). */
  private[graft] def keySortable(k: Any): (Int, Long, String) = k match {
    case l: Long => (0, l, "")
    case i: Int => (0, i.toLong, "")
    case s: String => (1, 0L, s)
    case o => (1, 0L, o.toString)
  }
}
