package graft.serving

import org.apache.spark.sql.Row

/** The reference's REST publisher surface, re-expressed as data.
  *
  * The reference ships a Spring Boot module (`gmall-publisher-2022`)
  * whose six controllers hand-concatenate Sugar-dashboard JSON over
  * the ADS mapper queries — e.g.
  * `controller/TrafficController.java:29-72` (categories/series bar),
  * `controller/CommodityStatsController.java:92-123` (name/value pie),
  * `controller/TradeController.java:22-35` (bare scalar),
  * `controller/UserStatsController.java:22-65` (columns/rows table) —
  * each taking a `date` request param that defaults to "today".
  *
  * Here the same surface is one endpoint TABLE (route → named query +
  * response shape) plus the shape renderers, because every mapper
  * already exists as an oracle-checked `SparkEntry.queries` entry
  * (`GmallAds`); the HTTP layer only selects a day slice and shapes
  * rows. "Today" over a static fixture means the LATEST `dt` present —
  * the streaming deployment's "current day" analog.
  *
  * Shapes, quoting and empty-day behavior mirror each controller
  * EXACTLY (audited route by route against the Java in round 13;
  * COVERAGE.md §serving carries the per-route table):
  *  - the five channel bar charts quote their series data
  *    (`TrafficController.java:47-48`); the hour chart and the legacy
  *    `/api/sugar/ch` emit bare numbers (`:439-446`,
  *    `SugarController.java:85-88`);
  *  - `visitorPerHr` zero-fills all 24 hour buckets
  *    (`TrafficController.java:423-446`);
  *  - `visitorPerType` is the pivoted 新/老访客 metric table with the
  *    bean's derived ratios (`TrafficController.java:385-410`,
  *    `TrafficVisitorTypeStats.java:23-42`);
  *  - the province maps wrap in `{"mapData":…,"valueName":…}`
  *    (`TradeController.java:108-116`);
  *  - most stat grids are TABLES with per-column quoting and output
  *    ids that differ from the SQL column names
  *    (`CommodityStatsController.java:43-66` quotes everything and
  *    renames trademark_name → trademark; the activity/coupon grids
  *    use camelCase ids and bare numbers);
  *  - an empty day slice returns the empty string (the controllers'
  *    `return ""` on a null/empty list), EXCEPT the two bare scalars,
  *    which render the null value into the template →
  *    `"data": null` (`TradeController.java:29-35`,
  *    `SugarController.java:55-60`).
  *
  * One documented divergence: `visitorPerType` in the reference NPEs
  * (HTTP 500) when a day has only one visitor class; here the missing
  * class renders as zeros.
  */
object SugarApi {

  sealed trait Shape
  /** Bar/line: `categories` from `label`, one series per
    * (column, display name). `quotedData` mirrors the per-controller
    * datum quoting (the 2022 channel charts quote; legacy `/ch` does
    * not). */
  final case class SeriesChart(label: String, series: Seq[(String, String)],
                               quotedData: Boolean = true) extends Shape
  /** visitorPerHr: categories are ALWAYS `"00".."23"`, each series
    * zero-filled per missing hour, data bare. */
  final case class HourSeries(hourCol: String, series: Seq[(String, String)]) extends Shape
  /** Pie / word-cloud: `[{"name":…,"value":…}]` (value bare). With
    * `mapName`, the province-map wrapper
    * `{"mapData":[…],"valueName":"<mapName>"}`. */
  final case class NameValue(label: String, value: String,
                             mapName: Option[String] = None) extends Shape
  /** Single bare number (`/trade/total`, legacy `/gmv`); empty day →
    * `"data": null` (the controller renders the null Double). */
  final case class ScalarValue(value: String) extends Shape
  /** One Sugar table column: source column in the frame, output id in
    * the payload (the controllers rename several), display name, and
    * whether the value is quoted. */
  final case class TableCol(src: String, id: String, name: String, quoted: Boolean)
  /** Sugar table: `{"columns":[{name,id}],"rows":[{id:value}]}`. */
  final case class TableShape(cols: Seq[TableCol]) extends Shape
  /** visitorPerType's pivoted metric table over the
    * (is_new, uv_ct, pv_ct, sv_ct, uj_ct, dur_sum) frame. */
  case object VisitorTypePivot extends Shape

  final case class Endpoint(query: String, shape: Shape)

  private def quotedCols(pairs: (String, String)*): Seq[TableCol] =
    pairs.map { case (c, n) => TableCol(c, c, n, quoted = true) }

  /** Route table — the six reference controllers' full mapping
    * surface plus the legacy module. Display names, output ids and
    * quoting are the reference dashboards' payload contract, mirrored
    * like the ADS SQL semantics. */
  val endpoints: Map[String, Endpoint] = Map(
    // TrafficController.java:29-270 — five quoted channel bar charts
    "/gmall/realtime/traffic/uvCt" ->
      Endpoint("ads_traffic_uv_ct", SeriesChart("ch", Seq("uv_ct" -> "独立访客数"))),
    "/gmall/realtime/traffic/svCt" ->
      Endpoint("ads_traffic_sv_ct", SeriesChart("ch", Seq("sv_ct" -> "会话数"))),
    "/gmall/realtime/traffic/pvPerSession" ->
      Endpoint("ads_traffic_pv_per_session",
        SeriesChart("ch", Seq("pv_per_session" -> "会话平均页面浏览数"))),
    "/gmall/realtime/traffic/durPerSession" ->
      Endpoint("ads_traffic_dur_per_session",
        SeriesChart("ch", Seq("dur_per_session" -> "会话平均页面访问时长"))),
    "/gmall/realtime/traffic/ujRate" ->
      Endpoint("ads_traffic_uj_rate", SeriesChart("ch", Seq("uj_rate" -> "跳出率"))),
    // TrafficController.java:256-287 — word cloud, bare values
    "/gmall/realtime/traffic/keywords" ->
      Endpoint("ads_traffic_keywords", NameValue("keyword", "keyword_score")),
    // TrafficController.java:290-410 — the pivoted visitor-class table
    "/gmall/realtime/traffic/visitorPerType" ->
      Endpoint("ads_visitor_type_stats", VisitorTypePivot),
    // TrafficController.java:412-483 — 24 zero-filled hour buckets, bare
    "/gmall/realtime/traffic/visitorPerHr" ->
      Endpoint("ads_visitor_stats_per_hour", HourSeries("hr", Seq(
        "uv_ct" -> "独立访客数", "pv_ct" -> "页面浏览数", "new_uv_ct" -> "新访客数"))),
    // TradeController.java:22-35 — bare scalar (null on empty day)
    "/gmall/realtime/trade/total" ->
      Endpoint("ads_trade_total_amount", ScalarValue("order_total_amount")),
    // TradeController.java:37-81 — table, type quoted / value bare
    "/gmall/realtime/trade/stats" ->
      Endpoint("ads_trade_stats", TableShape(Seq(
        TableCol("type", "type", "指标类型", quoted = true),
        TableCol("value", "value", "度量值", quoted = false)))),
    // TradeController.java:83-153 — province maps, mapData wrapper
    "/gmall/realtime/trade/provinceOrderCt" ->
      Endpoint("ads_trade_province_order_ct",
        NameValue("province_name", "order_count", mapName = Some("订单数"))),
    "/gmall/realtime/trade/provinceOrderAmount" ->
      Endpoint("ads_trade_province_order_amount",
        NameValue("province_name", "order_amount", mapName = Some("订单金额"))),
    // UserStatsController.java:22-65 — table, both quoted
    "/gmall/realtime/user/uvPerPage" ->
      Endpoint("ads_uv_by_page", TableShape(quotedCols(
        "page_id" -> "页面", "uv_ct" -> "独立访客数"))),
    // UserStatsController.java:66-109 / :111-155 — tables, quoted,
    // user_ct output id
    "/gmall/realtime/user/userChangeCt" ->
      Endpoint("ads_user_change_per_type", TableShape(Seq(
        TableCol("type", "type", "变动类型", quoted = true),
        TableCol("value", "user_ct", "用户数", quoted = true)))),
    "/gmall/realtime/user/userTradeCt" ->
      Endpoint("ads_trade_user_ct", TableShape(Seq(
        TableCol("trade_type", "type", "交易类型", quoted = true),
        TableCol("new_user_count", "user_ct", "新增用户数", quoted = true)))),
    // CommodityStatsController.java:23-90 — table, ALL quoted,
    // trademark_name renamed to trademark
    "/gmall/realtime/commodity/trademark" ->
      Endpoint("ads_trademark_stats", TableShape(
        TableCol("trademark_name", "trademark", "品牌名称", quoted = true) +:
        quotedCols("order_count" -> "订单数", "uu_count" -> "订单人数",
          "order_amount" -> "订单金额", "refund_count" -> "退单数",
          "refund_uu_count" -> "退单人数"))),
    // CommodityStatsController.java:92-123 — pie, bare value
    "/gmall/realtime/commodity/tmPieGraph" ->
      Endpoint("ads_trademark_order_amount_pie",
        NameValue("trademark_name", "order_amount")),
    // CommodityStatsController.java:125-207 — table, ALL quoted
    "/gmall/realtime/commodity/category" ->
      Endpoint("ads_category_stats", TableShape(quotedCols(
        "category1_name" -> "一级品类名称", "category2_name" -> "二级品类名称",
        "category3_name" -> "三级品类名称", "order_count" -> "订单数",
        "uu_count" -> "订单人数", "order_amount" -> "订单金额",
        "refund_count" -> "退单数", "refund_uu_count" -> "退单人数"))),
    // CommodityStatsController.java:209-276 — table, ALL quoted
    "/gmall/realtime/commodity/spu" ->
      Endpoint("ads_spu_stats", TableShape(quotedCols(
        "spu_name" -> "SPU 名称", "order_count" -> "下单次数",
        "uu_count" -> "下单人数", "order_amount" -> "订单金额"))),
    // ActivityStatsController.java:20-61 — camelCase ids, bare
    "/gmall/realtime/activity/stats" ->
      Endpoint("ads_activity_stats", TableShape(Seq(
        TableCol("activity_reduce_amount", "activityReduceAmount", "活动减免金额", quoted = false),
        TableCol("origin_total_amount", "originTotalAmount", "原始金额总和", quoted = false),
        TableCol("subsidy_rate", "activitySubsidyRate", "活动补贴率", quoted = false)))),
    // CouponStatsController.java:20-61 — camelCase ids, bare
    "/gmall/realtime/coupon/stats" ->
      Endpoint("ads_coupon_stats", TableShape(Seq(
        TableCol("coupon_reduce_amount", "couponReduceAmount", "优惠券减免金额", quoted = false),
        TableCol("origin_total_amount", "originTotalAmount", "原始金额总和", quoted = false),
        TableCol("coupon_subsidy_rate", "couponSubsidyRate", "优惠券补贴率", quoted = false)))),
    // Legacy module gmall-publisher SugarController.java:45-94: GMV
    // scalar + daily-active-by-channel series with BARE data
    "/api/sugar/gmv" -> Endpoint("ads_gmv", ScalarValue("gmv")),
    "/api/sugar/ch" ->
      Endpoint("ads_uv_by_ch_legacy",
        SeriesChart("ch", Seq("uv" -> "日活"), quotedData = false))
  )

  def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A row value as a bare JSON literal (numbers unquoted, strings
    * quoted, decimals in plain notation so 1E+2 never leaks). */
  def valueJson(v: Any): String = v match {
    case null => "null"
    // bare NaN/Infinity is invalid JSON — a zero-denominator ratio
    // slice must not make the whole payload unparseable
    case d: Double if java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d) => "null"
    case f: Float if java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f) => "null"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.underlying.toPlainString
    case n @ (_: Long | _: Int | _: Short | _: Byte | _: Double | _: Float) => n.toString
    case b: Boolean => b.toString
    case other => "\"" + jsonEscape(other.toString) + "\""
  }

  /** The same value as the reference's QUOTED series/table datum. */
  private def quoted(v: Any): String = v match {
    case null => "\"\""
    case d: java.math.BigDecimal => "\"" + d.toPlainString + "\""
    case other => "\"" + jsonEscape(other.toString) + "\""
  }

  private def field(fields: Array[String], name: String): Int = {
    val i = fields.indexOf(name)
    require(i >= 0, s"endpoint references missing column '$name' (have ${fields.mkString(",")})")
    i
  }

  /** Renders one endpoint's day slice. Empty slice → "" (the
    * controllers' empty-body contract), except [[ScalarValue]] →
    * `"data": null` (the scalar controllers render the null value). */
  def render(shape: Shape, fields: Array[String], rows: Seq[Row]): String = {
    shape match {
      case ScalarValue(value) =>
        val data = if (rows.isEmpty) "null" else valueJson(rows.head.get(field(fields, value)))
        return s"""{"status":0,"msg":"","data":$data}"""
      case _ => if (rows.isEmpty) return ""
    }
    shape match {
      case SeriesChart(label, series, quotedData) =>
        val li = field(fields, label)
        val cats = rows.map(r => quoted(r.get(li))).mkString("[", ",", "]")
        val ser = series.map { case (c, name) =>
          val ci = field(fields, c)
          val datum: Any => String = if (quotedData) quoted else valueJson
          val data = rows.map(r => datum(r.get(ci))).mkString("[", ",", "]")
          s"""{"name":"${jsonEscape(name)}","data":$data}"""
        }.mkString("[", ",", "]")
        s"""{"status":0,"msg":"","data":{"categories":$cats,"series":$ser}}"""
      case HourSeries(hourCol, series) =>
        val hi = field(fields, hourCol)
        val byHr = rows.iterator
          .filter(!_.isNullAt(hi))
          .map(r => r.get(hi).toString.toInt -> r).toMap
        val cats = (0 until 24).map(h => f""""$h%02d"""").mkString("[", ",", "]")
        val ser = series.map { case (c, name) =>
          val ci = field(fields, c)
          val data = (0 until 24)
            .map(h => byHr.get(h).map(r => valueJson(r.get(ci))).getOrElse("0"))
            .mkString("[", ",", "]")
          s"""{"name":"${jsonEscape(name)}","data":$data}"""
        }.mkString("[", ",", "]")
        s"""{"status":0,"msg":"","data":{"categories":$cats,"series":$ser}}"""
      case NameValue(label, value, mapName) =>
        val li = field(fields, label)
        val vi = field(fields, value)
        // quoted(...) for the label: a null renders as "" (the
        // series-datum null contract), never NPEs
        val data = rows.map(r =>
          s"""{"name":${quoted(r.get(li))},"value":${valueJson(r.get(vi))}}""")
          .mkString("[", ",", "]")
        mapName match {
          case Some(vn) =>
            s"""{"status":0,"msg":"","data":{"mapData":$data,"valueName":"${jsonEscape(vn)}"}}"""
          case None => s"""{"status":0,"msg":"","data":$data}"""
        }
      case TableShape(cols) =>
        val columns = cols.map { c =>
          s"""{"name":"${jsonEscape(c.name)}","id":"${jsonEscape(c.id)}"}"""
        }.mkString("[", ",", "]")
        val data = rows.map { r =>
          cols.map { c =>
            val v = r.get(field(fields, c.src))
            s""""${jsonEscape(c.id)}":${if (c.quoted) quoted(v) else valueJson(v)}"""
          }.mkString("{", ",", "}")
        }.mkString("[", ",", "]")
        s"""{"status":0,"msg":"","data":{"columns":$columns,"rows":$data}}"""
      case VisitorTypePivot =>
        // TrafficController.java:385-410 + TrafficVisitorTypeStats
        // .java:23-42: one row per metric, columns 新访客/老访客; a
        // missing visitor class renders as zeros (the reference NPEs —
        // documented divergence)
        def slot(r: Row, c: String): Long = r.get(field(fields, c)) match {
          case null => 0L
          case n => n.toString.toLong
        }
        def stats(isNew: Boolean): (Long, Long, Long, Long, Long) =
          rows.find(r =>
              (String.valueOf(r.get(field(fields, "is_new"))) == "1") == isNew)
            .map(r => (slot(r, "uv_ct"), slot(r, "pv_ct"), slot(r, "sv_ct"),
              slot(r, "uj_ct"), slot(r, "dur_sum")))
            .getOrElse((0L, 0L, 0L, 0L, 0L))
        val (nUv, nPv, nSv, nUj, nDur) = stats(isNew = true)
        val (oUv, oPv, oSv, oUj, oDur) = stats(isNew = false)
        // NOTE the (%)-labeled bounce metric is the PLAIN uj/sv
        // fraction — the reference bean's getUjRate returns
        // `(double)ujCt/(double)svCt` with no ×100 and the controller
        // prints it raw, so 0.25 (not 25) IS the audited payload
        def ratio(a: Long, sv: Long): Double = if (sv == 0) 0.0 else a.toDouble / sv
        def durSec(dur: Long, sv: Long): Double = if (sv == 0) 0.0 else dur.toDouble / sv / 1000
        val metricRows = Seq(
          ("访客数(人)", nUv.toString, oUv.toString),
          ("总访问页面数(次)", nPv.toString, oPv.toString),
          ("跳出率(%)", ratio(nUj, nSv).toString, ratio(oUj, oSv).toString),
          ("平均在线时长(秒)", durSec(nDur, nSv).toString, durSec(oDur, oSv).toString),
          ("平均访问页面数(人次)", ratio(nPv, nSv).toString, ratio(oPv, oSv).toString))
          .map { case (t, n, o) => s"""{"type":"${jsonEscape(t)}","new":$n,"old":$o}""" }
          .mkString("[", ",", "]")
        """{"status":0,"data":{"total":5,"columns":[""" +
          """{"name":"类别","id":"type"},{"name":"新访客","id":"new"},""" +
          s"""{"name":"老访客","id":"old"}],"rows":$metricRows}}"""
      case _: ScalarValue => "" // handled above
    }
  }
}
