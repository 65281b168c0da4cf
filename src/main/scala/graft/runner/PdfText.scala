package graft.runner

/** Minimal PDF 1.4 text renderer (pure JDK — the build is zero-egress,
  * so no openhtmltopdf; the reference merges its per-verb HTML docs to
  * one `merged.pdf` with that library, DocGen.java:178-196, and this
  * closes the same artifact gap with ~150 lines of the PDF spec).
  *
  * Scope: paginated styled text lines in the base-14 fonts (Helvetica /
  * Helvetica-Bold / Courier — never embedded, every reader ships them),
  * uncompressed content streams (so tests and humans can grep the
  * artifact for verbs), correct xref byte offsets. That is everything a
  * documentation artifact needs and nothing more.
  */
object PdfText {

  /** Line styles: (font object, size, leading). */
  private val styles: Map[Int, (String, Int, Int)] = Map(
    0 -> ("F1", 9, 12), // body
    1 -> ("F2", 16, 22), // h1
    2 -> ("F2", 13, 18), // h2
    3 -> ("F2", 11, 15), // h3
    4 -> ("F3", 8, 10)) // code

  private val PageW = 612
  private val PageH = 792
  private val MarginX = 54
  private val TopY = 756
  private val BottomY = 40

  private def esc(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '(' => sb ++= "\\("
      case ')' => sb ++= "\\)"
      case c if c >= 32 && c < 127 => sb += c
      case c if c > 160 && c <= 255 => sb += c
      case '\t' => sb ++= "    "
      case _ => sb += '?'
    }
    sb.result()
  }

  /** Greedy wrap at a per-style column budget so no line overruns the
    * text box (Courier at 8pt fits ~104 columns; proportional body text
    * is estimated conservatively). */
  private def wrap(style: Int, text: String): Seq[String] = {
    val cols = style match {
      case 4 => 104
      case 1 => 52
      case 2 => 64
      case 3 => 76
      case _ => 100
    }
    if (text.length <= cols) Seq(text)
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var rest = text
      while (rest.length > cols) {
        val cut = rest.lastIndexOf(' ', cols) match {
          case i if i >= cols / 2 => i
          case _ => cols
        }
        out += rest.substring(0, cut)
        rest = rest.substring(cut).dropWhile(_ == ' ')
      }
      if (rest.nonEmpty) out += rest
      out.toSeq
    }
  }

  /** Render styled lines ((style, text)*) to a complete PDF byte
    * stream. */
  def render(lines: Seq[(Int, String)]): Array[Byte] = {
    // paginate wrapped lines
    val pages = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, String)]]
    var page = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var y = TopY
    for ((st, raw) <- lines; text <- wrap(st, raw)) {
      val lead = styles(st)._3
      if (y - lead < BottomY) {
        pages += page.toSeq
        page = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
        y = TopY
      }
      page += ((st, text))
      y -= lead
    }
    if (page.nonEmpty || pages.isEmpty) pages += page.toSeq

    def contentStream(ls: Seq[(Int, String)]): String = {
      val sb = new StringBuilder("BT\n")
      var y = TopY
      var cur = ""
      for ((st, text) <- ls) {
        val (font, size, lead) = styles(st)
        y -= lead
        val sel = s"/$font $size Tf"
        if (sel != cur) { sb ++= sel + "\n"; cur = sel }
        sb ++= s"1 0 0 1 $MarginX $y Tm (${esc(text)}) Tj\n"
      }
      sb ++= "ET"
      sb.result()
    }

    // object layout: 1 catalog, 2 pages, 3-5 fonts, then (page, content)*
    val nPages = pages.size
    val pageObjIds = (0 until nPages).map(i => 6 + 2 * i)
    val objs = scala.collection.mutable.LinkedHashMap[Int, String]()
    objs(1) = "<< /Type /Catalog /Pages 2 0 R >>"
    objs(2) = s"<< /Type /Pages /Kids [${pageObjIds.map(id => s"$id 0 R").mkString(" ")}] /Count $nPages >>"
    objs(3) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    objs(4) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"
    objs(5) = "<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"
    for ((pl, i) <- pages.zipWithIndex) {
      val pid = 6 + 2 * i
      val cid = pid + 1
      objs(pid) =
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
          s"/Resources << /Font << /F1 3 0 R /F2 4 0 R /F3 5 0 R >> >> /Contents $cid 0 R >>"
      val cs = contentStream(pl)
      objs(cid) = s"<< /Length ${cs.getBytes("ISO-8859-1").length} >>\nstream\n$cs\nendstream"
    }

    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n%âãÏÓ\n")
    val offsets = scala.collection.mutable.LinkedHashMap[Int, Int]()
    for ((id, body) <- objs) {
      offsets(id) = out.size()
      w(s"$id 0 obj\n$body\nendobj\n")
    }
    val xrefAt = out.size()
    val maxId = objs.keys.max
    w(s"xref\n0 ${maxId + 1}\n")
    w(f"${0}%010d 65535 f \n")
    for (id <- 1 to maxId)
      w(f"${offsets(id)}%010d 00000 n \n")
    w(s"trailer\n<< /Size ${maxId + 1} /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }
}
