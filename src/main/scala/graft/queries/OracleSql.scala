package graft.queries

/** Shared DuckDB oracle-SQL fragments. ONE definition per cross-query
  * contract: if tokenization ever changes it changes here and in
  * graft.text.TextMetrics.tokens together, or every oracle silently
  * diverges.
  */
private[queries] object OracleSql {

  /** Whitespace tokenization — the DuckDB mirror of
    * `TextMetrics.tokens`: null/blank -> empty list, else trim +
    * split on runs of whitespace.
    */
  def toks(t: String): String =
    s"CASE WHEN $t IS NULL OR trim($t) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim($t), '\\s+') END"
}
