package graft.surface

/** Shared wire-format fragments for the HTTP and WebSocket surfaces. */
object Wire {

  /** `{k=v,…}` label/attribute block, keys sorted — the metadata
    * rendering shared by find/delete responses, Plasma SUB lines and
    * the TEXT push format (GTSHelper.metadataToString shape under this
    * engine's unencoded [[graft.sources.LineProtocol]] convention). */
  def labels(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("{", ",", "}")
}
