package graft.sources

import java.net.URLDecoder
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** GTS series selector — `class{label=v,label~regex}{attr...}` with
  * exact (`=`) and regex (`~`) components, URL-encoded (reference:
  * continuum/gts/MetadataSelectorMatcher.java:42-248; parser
  * fn/PARSESELECTOR.java).
  *
  * Faithful faces (r13, mined from the reference's OWN
  * MetadataSelectorMatcherTest): a bare `=` or `~` class matches only
  * the EMPTY class name; a leading `=` is the exact-match marker
  * (stripped); a component value of `''` or `=` asserts the key is
  * ABSENT (Constants.ABSENT_LABEL_SUPPORT); and the STANDARD one-map
  * form `class{k=v}` matches k against the label IF PRESENT, else
  * against the attribute — only the EXTENDED form
  * `class{labels}{attrs}` checks the two maps strictly
  * (MetadataSelectorMatcher.java:42-46, 185-248). [[matches]] is the
  * driver-side mirror of `MetadataSelectorMatcher.matches` for the
  * metadata words (METAMATCH, filter.byselector); [[predicate]] stays
  * the LABELS-ONLY Column for the storage scan path, where series
  * identity is (class, labels).
  *
  * The compiled form is a plain Column predicate so the series-pruning
  * path participates in Catalyst pushdown; a `~.*{}` match-all fast
  * path mirrors matcher line 73.
  */
final case class Selector(
    classExact: Option[String], classRegex: Option[String],
    labelExact: Map[String, String], labelRegex: Map[String, String],
    attrExact: Map[String, String], attrRegex: Map[String, String],
    labelAbsent: Set[String] = Set.empty,
    attrAbsent: Set[String] = Set.empty,
    extended: Boolean = false) {

  /** Predicate over the canonical long table (class, labels). */
  def predicate: Column = {
    val classPred = (classExact, classRegex) match {
      case (Some(c), _)            => col("class") === c
      case (_, Some(r)) if r == ".*" => lit(true)
      case (_, Some(r))            => col("class").rlike("^(?:" + r + ")$")
      case _                       => lit(true)
    }
    val abs = labelAbsent.foldLeft(classPred) { (acc, k) =>
      acc && col("labels").getItem(k).isNull
    }
    val lbl = labelExact.foldLeft(abs) { case (acc, (k, v)) =>
      acc && col("labels").getItem(k) === v
    }
    labelRegex.foldLeft(lbl) { case (acc, (k, v)) =>
      acc && col("labels").getItem(k).rlike("^(?:" + v + ")$")
    }
  }

  /** Predicate over the metadata table (adds attribute components). */
  def metaPredicate: Column = {
    val base = predicate
    val abs = attrAbsent.foldLeft(base) { (acc, k) =>
      acc && col("attributes").getItem(k).isNull
    }
    val ae = attrExact.foldLeft(abs) { case (acc, (k, v)) =>
      acc && col("attributes").getItem(k) === v
    }
    attrRegex.foldLeft(ae) { case (acc, (k, v)) =>
      acc && col("attributes").getItem(k).rlike("^(?:" + v + ")$")
    }
  }

  private def fullMatch(regex: String, s: String): Boolean =
    java.util.regex.Pattern.compile(regex).matcher(s).matches()

  /** Driver-side mirror of `MetadataSelectorMatcher.matches:155-248`:
    * class first; then the EXTENDED form checks labels and attributes
    * strictly while the STANDARD form matches each component against
    * the label if present, else the attribute (absent components
    * assert absence on both sides in the standard form). */
  def matches(cls: String, labels: Map[String, String],
              attrs: Map[String, String]): Boolean = {
    val classOk = (classExact, classRegex) match {
      case (Some(c), _) => cls == c
      case (_, Some(r)) if r == ".*" => true
      case (_, Some(r)) => fullMatch(r, cls)
      case _ => true
    }
    if (!classOk) return false
    def one(v: Option[String], sel: Either[String, String]): Boolean =
      v.exists(x => sel.fold(_ == x, r => fullMatch(r, x)))
    if (extended) {
      labelAbsent.forall(k => !labels.contains(k)) &&
      labelExact.forall { case (k, v) => one(labels.get(k), Left(v)) } &&
      labelRegex.forall { case (k, r) => one(labels.get(k), Right(r)) } &&
      attrAbsent.forall(k => !attrs.contains(k)) &&
      attrExact.forall { case (k, v) => one(attrs.get(k), Left(v)) } &&
      attrRegex.forall { case (k, r) => one(attrs.get(k), Right(r)) }
    } else {
      def fallback(k: String, sel: Either[String, String]): Boolean =
        labels.get(k) match {
          case Some(x) => sel.fold(_ == x, r => fullMatch(r, x))
          case None => one(attrs.get(k), sel)
        }
      labelAbsent.forall(k => !labels.contains(k) && !attrs.contains(k)) &&
      labelExact.forall { case (k, v) => fallback(k, Left(v)) } &&
      labelRegex.forall { case (k, r) => fallback(k, Right(r)) }
    }
  }
}

object Selector {

  private def dec(s: String): String =
    if (s.contains("%")) URLDecoder.decode(s, StandardCharsets.UTF_8) else s

  /** Parse `class{labels}` or `class{labels}{attributes}`; class may be
    * `~regex`, `=exact` (marker stripped) or bare exact (URL-encoded);
    * a bare `=`/`~` class matches only the empty name
    * (MetadataSelectorMatcher.java:75-85). */
  def parse(sel: String): Selector = {
    val brace = sel.indexOf('{')
    val clsPart = if (brace < 0) sel else sel.substring(0, brace)
    val (ce, cr) =
      if (clsPart == "=" || clsPart == "~") (Some(""), None)
      else if (clsPart.startsWith("~")) (None, Some(clsPart.substring(1)))
      else if (clsPart.startsWith("=")) (Some(dec(clsPart.substring(1))), None)
      else if (clsPart == "") (None, Some(".*"))
      else (Some(dec(clsPart)), None)

    def parseBlock(s: String)
        : (Map[String, String], Map[String, String], Set[String]) = {
      if (s.isEmpty) return (Map.empty, Map.empty, Set.empty)
      val exact = Map.newBuilder[String, String]
      val regex = Map.newBuilder[String, String]
      val absent = Set.newBuilder[String]
      s.split(',').foreach { kv =>
        val ti = kv.indexOf('~')
        val ei = kv.indexOf('=')
        if (ti >= 0 && (ei < 0 || ti < ei))
          regex += dec(kv.substring(0, ti)) -> dec(kv.substring(ti + 1))
        else if (ei >= 0) {
          val v = kv.substring(ei + 1)
          // an empty value (`k=`) is the ABSENT-key assertion
          // (Constants.ABSENT_LABEL_SUPPORT, matcher:103-108 — the
          // parsed value there is the bare `=`); `k==x` stays the
          // exact value `=x`
          if (v.isEmpty) absent += dec(kv.substring(0, ei))
          else exact += dec(kv.substring(0, ei)) -> dec(v)
        }
        else throw new IllegalArgumentException(s"Invalid selector component '$kv'")
      }
      (exact.result(), regex.result(), absent.result())
    }

    var labels = (Map.empty[String, String], Map.empty[String, String], Set.empty[String])
    var attrs = (Map.empty[String, String], Map.empty[String, String], Set.empty[String])
    var extended = false
    if (brace >= 0) {
      val end1 = sel.indexOf('}', brace + 1)
      require(end1 >= 0, "Missing '}' in selector")
      labels = parseBlock(sel.substring(brace + 1, end1))
      val brace2 = sel.indexOf('{', end1)
      if (brace2 >= 0) {
        val end2 = sel.indexOf('}', brace2 + 1)
        require(end2 >= 0, "Missing attribute '}' in selector")
        attrs = parseBlock(sel.substring(brace2 + 1, end2))
        extended = true
      }
    }
    Selector(ce, cr, labels._1, labels._2, attrs._1, attrs._2,
      labels._3, attrs._3, extended)
  }
}
