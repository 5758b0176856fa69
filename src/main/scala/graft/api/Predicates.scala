package graft.api

/** Predicate-dialect translation helpers (eland/filter.py algebra). */
object Predicates {

  /** eland wildcard (`*`/`?`, eland/filter.py:136-139) → SQL LIKE,
    * escaping literal `%`/`_`.
    */
  def wildcardToLike(pattern: String): String =
    pattern.flatMap {
      case '*' => "%"
      case '?' => "_"
      case '%' => "\\%"
      case '_' => "\\_"
      case c   => c.toString
    }
}
