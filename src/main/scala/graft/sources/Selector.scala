package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GTS series selector — `class{label=v,label~regex}{attr...}` with
  * exact (`=`) and regex (`~`) components, URL-encoded (reference:
  * continuum/gts/MetadataSelectorMatcher.java:42-110; parser
  * fn/PARSESELECTOR.java).
  *
  * The compiled form is a plain Column predicate so the series-pruning
  * path participates in Catalyst pushdown; a `~.*{}` match-all fast
  * path mirrors matcher line 73.
  */
final case class Selector(
    classExact: Option[String], classRegex: Option[String],
    labelExact: Map[String, String], labelRegex: Map[String, String],
    attrExact: Map[String, String], attrRegex: Map[String, String]) {

  /** Predicate over the canonical long table (class, labels). */
  def predicate: Column = {
    val classPred = (classExact, classRegex) match {
      case (Some(c), _)            => col("class") === c
      case (_, Some(r)) if r == ".*" => lit(true)
      case (_, Some(r))            => col("class").rlike("^(?:" + r + ")$")
      case _                       => lit(true)
    }
    val lbl = labelExact.foldLeft(classPred) { case (acc, (k, v)) =>
      acc && col("labels").getItem(k) === v
    }
    labelRegex.foldLeft(lbl) { case (acc, (k, v)) =>
      acc && col("labels").getItem(k).rlike("^(?:" + v + ")$")
    }
  }

  /** Predicate over the metadata table (adds attribute components). */
  def metaPredicate: Column = {
    val base = predicate
    val ae = attrExact.foldLeft(base) { case (acc, (k, v)) =>
      acc && col("attributes").getItem(k) === v
    }
    attrRegex.foldLeft(ae) { case (acc, (k, v)) =>
      acc && col("attributes").getItem(k).rlike("^(?:" + v + ")$")
    }
  }
}

object Selector {

  private def dec(s: String): String =
    if (s.contains("%")) URLDecoder.decode(s, StandardCharsets.UTF_8) else s

  /** Parse `class{labels}` or `class{labels}{attributes}`; class may be
    * `~regex` or exact (URL-encoded). */
  def parse(sel: String): Selector = {
    val brace = sel.indexOf('{')
    val clsPart = if (brace < 0) sel else sel.substring(0, brace)
    val (ce, cr) =
      if (clsPart.startsWith("~")) (None, Some(clsPart.substring(1)))
      else if (clsPart == "") (None, Some(".*"))
      else (Some(dec(clsPart)), None)

    def parseBlock(s: String): (Map[String, String], Map[String, String]) = {
      if (s.isEmpty) return (Map.empty, Map.empty)
      val exact = Map.newBuilder[String, String]
      val regex = Map.newBuilder[String, String]
      s.split(',').foreach { kv =>
        val ti = kv.indexOf('~')
        val ei = kv.indexOf('=')
        if (ti >= 0 && (ei < 0 || ti < ei))
          regex += dec(kv.substring(0, ti)) -> dec(kv.substring(ti + 1))
        else if (ei >= 0)
          exact += dec(kv.substring(0, ei)) -> dec(kv.substring(ei + 1))
        else throw new IllegalArgumentException(s"Invalid selector component '$kv'")
      }
      (exact.result(), regex.result())
    }

    var labels = (Map.empty[String, String], Map.empty[String, String])
    var attrs = (Map.empty[String, String], Map.empty[String, String])
    if (brace >= 0) {
      val end1 = sel.indexOf('}', brace + 1)
      require(end1 >= 0, "Missing '}' in selector")
      labels = parseBlock(sel.substring(brace + 1, end1))
      val brace2 = sel.indexOf('{', end1)
      if (brace2 >= 0) {
        val end2 = sel.indexOf('}', brace2 + 1)
        require(end2 >= 0, "Missing attribute '}' in selector")
        attrs = parseBlock(sel.substring(brace2 + 1, end2))
      }
    }
    Selector(ce, cr, labels._1, labels._2, attrs._1, attrs._2)
  }
}
