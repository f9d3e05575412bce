package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free HTML parser + CSS-selector engine.
  *
  * No jsoup exists in the sandbox classpath, and the reference's extraction
  * layer (BeautifulSoup `html.parser` + lxml xpath,
  * /root/reference/scripts/utils/extraction_helpers.py:3-28) only exercises a
  * small, well-defined selector surface:
  *
  *   `.class`            carrefour_extract_data.py:28,51,107,116
  *   `tag.class`         carrefour_extract_data.py:99 (`del.css-1bdwabt`)
  *   `#id`               carrefour_extract_data.py:64 (`#__NEXT_DATA__`)
  *   `A > B:nth-child(n)` carrefour_extract_data.py:37
  *   `A B` (descendant)  carrefour_extract_data.py:89 (`div.css-1c2pck7 img`)
  *   `tag[attr=value]`   metro_markets_extract_product_data.py:114
  *   bare `tag`          link harvest (`a`), breadcrumb `li`
  *
  * This engine implements exactly that surface over a proper DOM tree, with
  * BeautifulSoup-compatible `.text` semantics (concatenation of descendant
  * text nodes in document order, entities decoded) so extraction is
  * byte-identical per url. Pure Scala, usable inside executor-side UDFs.
  */
object MiniHtml {

  final val VoidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private val RawTextTags: Set[String] = Set("script", "style")

  sealed trait Node
  final case class Text(value: String) extends Node
  final case class Elem(
      tag: String,
      attrs: Map[String, String],
      children: ArrayBuffer[Node]) extends Node {
    /** Cached: the selector engine probes this once per (element, selector
      * with a class part) — recomputing the regex split per probe made class
      * matching the dominant per-page cost (~14 selectors × every element).
      * Nodes never leave the executor-side eval, so @transient is safe. */
    @transient lazy val classes: Set[String] =
      attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet).getOrElse(Set.empty)
    /** BeautifulSoup-style `.text`: all descendant text, document order. */
    def text: String = {
      val sb = new StringBuilder
      def walk(n: Node): Unit = n match {
        case Text(v) => sb.append(v)
        case e: Elem => e.children.foreach(walk)
      }
      walk(this)
      sb.toString
    }
  }

  // -------------------------------------------------------------------
  // Entities — the subset that can appear in our synthetic corpus plus
  // the universal basics (html.parser decodes all named entities; our
  // generated pages only ever use these).
  // -------------------------------------------------------------------
  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ")

  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(body.substring(2), 16))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else if (body.startsWith("#")) {
            try { sb.appendAll(Character.toChars(Integer.parseInt(body.substring(1)))); i = semi + 1 }
            catch { case _: Exception => sb.append(c); i += 1 }
          } else Named.get(body) match {
            case Some(rep) => sb.append(rep); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // -------------------------------------------------------------------
  // Parser
  // -------------------------------------------------------------------

  /** Parse an HTML document into a single synthetic root element. Forgiving:
    * unclosed tags are auto-closed, unknown constructs skipped. */
  def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty, ArrayBuffer.empty)
    if (html == null) return root
    val stack = scala.collection.mutable.Stack[Elem](root)
    var i = 0
    val n = html.length
    def top = stack.top
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) top.children += Text(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i) top.children += Text(decodeEntities(html.substring(i, lt)))
        if (lt + 1 >= n) { i = n }
        else if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?') {
          val end = html.indexOf('>', lt + 1)
          i = if (end < 0) n else end + 1
        } else if (html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt + 2)
          val name = html.substring(lt + 2, if (end < 0) n else end).trim.toLowerCase
          // pop to matching open tag if present
          if (stack.exists(e => e.tag == name)) {
            while (stack.top.tag != name && stack.size > 1) stack.pop()
            if (stack.size > 1) stack.pop()
          }
          i = if (end < 0) n else end + 1
        } else {
          // open tag
          val end = findTagEnd(html, lt + 1)
          if (end < 0) { top.children += Text(html.substring(lt)); i = n }
          else {
            val inner = html.substring(lt + 1, end)
            val selfClose = inner.endsWith("/")
            val body = if (selfClose) inner.dropRight(1) else inner
            val (tag, attrs) = parseTag(body)
            if (tag.nonEmpty) {
              val el = Elem(tag, attrs, ArrayBuffer.empty)
              top.children += el
              i = end + 1
              if (!selfClose && !VoidTags.contains(tag)) {
                if (RawTextTags.contains(tag)) {
                  // raw text until matching close tag
                  val closeIdx = indexOfClose(html, i, tag)
                  val (rawEnd, next) = if (closeIdx < 0) (n, n) else (closeIdx, html.indexOf('>', closeIdx) + 1)
                  el.children += Text(html.substring(i, rawEnd))
                  i = if (next <= 0) n else next
                } else {
                  stack.push(el)
                }
              }
            } else i = end + 1
          }
        }
      }
    }
    root
  }

  private def indexOfClose(html: String, from: Int, tag: String): Int = {
    // case-insensitive scan via regionMatches — no per-iteration lowercased
    // copy of the whole document (this runs once per script/style tag in the
    // one-parse-per-page hot path)
    val pat = "</" + tag
    var i = from
    val n = html.length
    while (i <= n - pat.length) {
      if (html.regionMatches(true, i, pat, 0, pat.length)) {
        val after = i + pat.length
        if (after >= n || html.charAt(after) == '>' || html.charAt(after).isWhitespace) return i
      }
      i += 1
    }
    -1
  }

  private def findTagEnd(html: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return i
      i += 1
    }
    -1
  }

  private def parseTag(body: String): (String, Map[String, String]) = {
    var i = 0
    val n = body.length
    while (i < n && !body.charAt(i).isWhitespace) i += 1
    val tag = body.substring(0, i).toLowerCase
    if (!tag.forall(c => c.isLetterOrDigit || c == '-' || c == ':')) return ("", Map.empty)
    var attrs = Map.empty[String, String]
    while (i < n) {
      while (i < n && body.charAt(i).isWhitespace) i += 1
      if (i >= n) return (tag, attrs)
      val nameStart = i
      while (i < n && !body.charAt(i).isWhitespace && body.charAt(i) != '=') i += 1
      val name = body.substring(nameStart, i).toLowerCase
      while (i < n && body.charAt(i).isWhitespace) i += 1
      if (i < n && body.charAt(i) == '=') {
        i += 1
        while (i < n && body.charAt(i).isWhitespace) i += 1
        if (i < n && (body.charAt(i) == '"' || body.charAt(i) == '\'')) {
          val q = body.charAt(i); i += 1
          val vStart = i
          while (i < n && body.charAt(i) != q) i += 1
          attrs += name -> decodeEntities(body.substring(vStart, i))
          i += 1
        } else {
          val vStart = i
          while (i < n && !body.charAt(i).isWhitespace) i += 1
          attrs += name -> decodeEntities(body.substring(vStart, i))
        }
      } else if (name.nonEmpty) attrs += name -> ""
    }
    (tag, attrs)
  }

  // -------------------------------------------------------------------
  // Selector engine
  // -------------------------------------------------------------------

  private final case class Simple(
      tag: Option[String],
      classes: List[String],
      id: Option[String],
      attr: Option[(String, String)],
      nthChild: Option[Int]) {
    def matches(e: Elem, childIndex: Int): Boolean =
      tag.forall(_ == e.tag) &&
        classes.forall(e.classes.contains) &&
        id.forall(v => e.attrs.get("id").contains(v)) &&
        attr.forall { case (k, v) => e.attrs.get(k).contains(v) } &&
        nthChild.forall(_ == childIndex)
  }

  private final case class Compound(parts: List[(Simple, Boolean)])
  // parts ordered left->right; Boolean = "direct child of previous" (>)

  private def parseSimple(s: String): Simple = {
    var rest = s
    var nth: Option[Int] = None
    val nthIdx = rest.indexOf(":nth-child(")
    if (nthIdx >= 0) {
      val close = rest.indexOf(')', nthIdx)
      nth = Some(rest.substring(nthIdx + 11, close).trim.toInt)
      rest = rest.substring(0, nthIdx) + rest.substring(close + 1)
    }
    var attr: Option[(String, String)] = None
    val brIdx = rest.indexOf('[')
    if (brIdx >= 0) {
      val close = rest.indexOf(']', brIdx)
      val body = rest.substring(brIdx + 1, close)
      val eq = body.indexOf('=')
      attr =
        if (eq >= 0) Some((body.substring(0, eq).toLowerCase, body.substring(eq + 1).stripPrefix("\"").stripSuffix("\"").stripPrefix("'").stripSuffix("'")))
        else Some((body.toLowerCase, ""))
      rest = rest.substring(0, brIdx) + rest.substring(close + 1)
    }
    val classes = ArrayBuffer.empty[String]
    var id: Option[String] = None
    var tag: Option[String] = None
    var i = 0
    var cur = new StringBuilder
    var mode: Char = 't'
    def flush(): Unit = {
      val v = cur.toString
      if (v.nonEmpty) mode match {
        case 't' => tag = Some(v.toLowerCase)
        case '.' => classes += v
        case '#' => id = Some(v)
      }
      cur = new StringBuilder
    }
    while (i < rest.length) {
      val c = rest.charAt(i)
      if (c == '.' || c == '#') { flush(); mode = c } else cur.append(c)
      i += 1
    }
    flush()
    Simple(tag, classes.toList, id, attr, nth)
  }

  private def parseSelector(sel: String): Compound = {
    // tokenize on whitespace, treating ">" as its own token
    val toks = sel.replace(">", " > ").trim.split("\\s+").filter(_.nonEmpty)
    val parts = ArrayBuffer.empty[(Simple, Boolean)]
    var childFlag = false
    toks.foreach {
      case ">" => childFlag = true
      case t => parts += ((parseSimple(t), childFlag)); childFlag = false
    }
    Compound(parts.toList)
  }

  /** Compile-once selector cache: the kernel issues the same ~14 constant
    * selectors for every page, so the tokenizer/regex work runs once per
    * executor JVM instead of once per (page, selector). Unbounded is fine —
    * the key set is the program's selector literals. */
  private val selectorCache =
    new java.util.concurrent.ConcurrentHashMap[String, IndexedSeq[(Simple, Boolean)]]()

  private def compiledSelector(sel: String): IndexedSeq[(Simple, Boolean)] = {
    val hit = selectorCache.get(sel)
    if (hit != null) hit
    else {
      val parts = parseSelector(sel).parts.toIndexedSeq
      selectorCache.putIfAbsent(sel, parts)
      parts
    }
  }

  /** Right-to-left compound match of `parts(pi)` at `node` against the
    * ancestor chain (shared by select and selectMany so the two paths
    * cannot diverge). */
  private def matchesAt(parts: IndexedSeq[(Simple, Boolean)], pi: Int,
      node: (Elem, Int), anc: List[(Elem, Int)]): Boolean = {
    val (simple, directChild) = parts(pi)
    if (!simple.matches(node._1, node._2)) return false
    if (pi == 0) return true
    if (directChild) anc match {
      case p :: rest => matchesAt(parts, pi - 1, p, rest)
      case Nil => false
    } else {
      var a = anc
      while (a.nonEmpty) {
        if (matchesAt(parts, pi - 1, a.head, a.tail)) return true
        a = a.tail
      }
      false
    }
  }

  /** All elements matching `selector`, document order. The compound is
    * matched right-to-left against the element's ancestor chain; each part's
    * flag means "this part must be a direct child of the part to its left". */
  def select(root: Elem, selector: String): List[Elem] =
    selectMany(root, IndexedSeq(selector))(0)

  /** Evaluate MANY selectors in ONE walk of the DOM, returning each
    * selector's matches in document order — exactly `select` per selector,
    * fused. The extraction kernel issues ~14 constant selectors per page;
    * walking once amortizes the per-node work (ancestor-chain cons, child
    * indexing, closure dispatch) that dominated when each selector walked
    * the whole tree itself (DebugKernelProfile: the 14 walks were ~70% of
    * kernel time, the parse ~20%). */
  def selectMany(root: Elem, selectors: IndexedSeq[String]): Array[List[Elem]] = {
    val compiled = new Array[IndexedSeq[(Simple, Boolean)]](selectors.length)
    var k = 0
    while (k < selectors.length) { compiled(k) = compiledSelector(selectors(k)); k += 1 }
    val out = Array.fill(selectors.length)(ArrayBuffer.empty[Elem])
    def walk(e: Elem, ancestors: List[(Elem, Int)], childIdx: Int): Unit = {
      val node = (e, childIdx)
      var i = 0
      while (i < compiled.length) {
        val parts = compiled(i)
        if (parts.nonEmpty && matchesAt(parts, parts.length - 1, node, ancestors))
          out(i) += e
        i += 1
      }
      val withSelf = node :: ancestors
      var idx = 0
      e.children.foreach {
        case ch: Elem => idx += 1; walk(ch, withSelf, idx)
        case _ =>
      }
    }
    var idx = 0
    root.children.foreach {
      case ch: Elem => idx += 1; walk(ch, Nil, idx)
      case _ =>
    }
    out.map(_.toList)
  }

  /** First match or None — BeautifulSoup select_one. */
  def selectOne(root: Elem, selector: String): Option[Elem] =
    select(root, selector).headOption

  // -------------------------------------------------------------------
  // XPath subset — absolute positional paths (the lxml surface the
  // reference uses: extraction_helpers.py:19-25 with the literal path
  // metro_markets_extract_product_data.py:100).
  // -------------------------------------------------------------------

  /** lxml `element.text` semantics: the text BEFORE the first child element,
    * or None when there is none (unlike BeautifulSoup `.text`, which
    * concatenates all descendant text). */
  def directText(e: Elem): Option[String] = {
    val sb = new StringBuilder
    var done = false
    e.children.foreach {
      case Text(v) if !done => sb.append(v)
      case _: Elem => done = true
      case _ =>
    }
    if (sb.isEmpty) None else Some(sb.toString)
  }

  /** Evaluate an absolute positional XPath like
    * `/html/body/div[3]/div[1]/main/div/div/div/div[2]/div/header/div/h5`:
    * each step selects child ELEMENTS by tag; `tag[i]` takes the i-th
    * (1-based) among same-tag siblings, bare `tag` keeps all of them
    * (standard XPath child-axis semantics). Returns matches in document
    * order. */
  private val StepRe = "([a-zA-Z0-9-]+)(?:\\[(\\d+)\\])?".r
  /** Compile-once xpath-step cache, same rationale as `selectorCache` (the
    * kernel evaluates one constant path per page). None = unsupported form. */
  private val xpathCache =
    new java.util.concurrent.ConcurrentHashMap[String, Option[List[(String, Option[Int])]]]()

  def selectXPath(root: Elem, path: String): List[Elem] = {
    var compiled = xpathCache.get(path)
    if (compiled == null) {
      def compile(p: String): Option[List[(String, Option[Int])]] =
        Some(p.split("/").filter(_.nonEmpty).toList.map {
          case StepRe(tag, idx) => (tag.toLowerCase, Option(idx).map(_.toInt))
          case _ => return None // unsupported step form
        })
      compiled = compile(path)
      xpathCache.putIfAbsent(path, compiled)
    }
    val steps = compiled match {
      case Some(s) => s
      case None => return Nil
    }
    var current: List[Elem] = List(root)
    steps.foreach { case (tag, idx) =>
      current = current.flatMap { e =>
        val byTag = e.children.collect { case c: Elem if c.tag == tag => c }
        idx match {
          case Some(i) => if (i >= 1 && i <= byTag.length) List(byTag(i - 1)) else Nil
          case None => byTag.toList
        }
      }
    }
    current
  }
}
