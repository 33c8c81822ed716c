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
  * `controller/TrafficController.java:290-410` (columns/rows table) —
  * each taking a `date` request param that defaults to "today".
  *
  * Here the same surface is one endpoint TABLE (route → named query +
  * response shape) plus four tiny renderers, because every mapper
  * already exists as an oracle-checked `SparkEntry.queries` entry
  * (`GmallAds`); the HTTP layer only selects a day slice and shapes
  * rows. "Today" over a static fixture means the LATEST `dt` present —
  * the streaming deployment's "current day" analog.
  *
  * Value quoting mirrors the reference exactly: series data and
  * categories are quoted strings, pie values and the scalar are bare
  * numbers, and an empty day slice returns the empty string (the
  * controllers' `return ""`).
  */
object SugarApi {

  sealed trait Shape
  /** Bar/line: `categories` from `label`, one series per
    * (column, display name). */
  final case class SeriesChart(label: String, series: Seq[(String, String)]) extends Shape
  /** Pie / word-cloud / map: `[{"name":…,"value":…}]`. */
  final case class NameValue(label: String, value: String) extends Shape
  /** Single bare number (`/trade/total`). */
  final case class ScalarValue(value: String) extends Shape
  /** Sugar table: `{"columns":[{name,id}],"rows":[{id:value}]}`. */
  final case class TableShape(cols: Seq[(String, String)]) extends Shape

  final case class Endpoint(query: String, shape: Shape)

  /** Route table — the six reference controllers' full mapping
    * surface. Display names are the reference dashboards' series
    * labels (payload contract, mirrored like the ADS SQL semantics). */
  val endpoints: Map[String, Endpoint] = Map(
    // TrafficController.java:17-455
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
    "/gmall/realtime/traffic/keywords" ->
      Endpoint("ads_traffic_keywords", NameValue("keyword", "keyword_score")),
    "/gmall/realtime/traffic/visitorPerType" ->
      Endpoint("ads_visitor_type_stats", TableShape(Seq(
        "is_new" -> "类别", "uv_ct" -> "独立访客数", "pv_ct" -> "页面浏览数",
        "sv_ct" -> "会话数", "uj_ct" -> "跳出会话数", "dur_sum" -> "会话访问时长"))),
    "/gmall/realtime/traffic/visitorPerHr" ->
      Endpoint("ads_visitor_stats_per_hour", SeriesChart("hr", Seq(
        "uv_ct" -> "独立访客数", "pv_ct" -> "页面浏览数", "new_uv_ct" -> "新访客数"))),
    // TradeController.java:16-154
    "/gmall/realtime/trade/total" ->
      Endpoint("ads_trade_total_amount", ScalarValue("order_total_amount")),
    "/gmall/realtime/trade/stats" ->
      Endpoint("ads_trade_stats", SeriesChart("type", Seq("value" -> "度量值"))),
    "/gmall/realtime/trade/provinceOrderCt" ->
      Endpoint("ads_trade_province_order_ct", NameValue("province_name", "order_count")),
    "/gmall/realtime/trade/provinceOrderAmount" ->
      Endpoint("ads_trade_province_order_amount",
        NameValue("province_name", "order_amount")),
    // UserStatsController.java:16-156
    "/gmall/realtime/user/uvPerPage" ->
      Endpoint("ads_uv_by_page", SeriesChart("page_id", Seq("uv_ct" -> "独立访客数"))),
    "/gmall/realtime/user/userChangeCt" ->
      Endpoint("ads_user_change_per_type", SeriesChart("type", Seq("value" -> "用户数"))),
    "/gmall/realtime/user/userTradeCt" ->
      Endpoint("ads_trade_user_ct",
        SeriesChart("trade_type", Seq("new_user_count" -> "新增用户数"))),
    // CommodityStatsController.java:17-276
    "/gmall/realtime/commodity/trademark" ->
      Endpoint("ads_trademark_stats", SeriesChart("trademark_name", Seq(
        "order_count" -> "下单次数", "uu_count" -> "下单人数",
        "order_amount" -> "订单金额", "refund_count" -> "退单数",
        "refund_uu_count" -> "退单人数"))),
    "/gmall/realtime/commodity/tmPieGraph" ->
      Endpoint("ads_trademark_order_amount_pie",
        NameValue("trademark_name", "order_amount")),
    "/gmall/realtime/commodity/category" ->
      Endpoint("ads_category_stats", TableShape(Seq(
        "category1_name" -> "一级品类名称", "category2_name" -> "二级品类名称",
        "category3_name" -> "三级品类名称", "order_count" -> "下单次数",
        "uu_count" -> "下单人数", "order_amount" -> "订单金额",
        "refund_count" -> "退单数", "refund_uu_count" -> "退单人数"))),
    "/gmall/realtime/commodity/spu" ->
      Endpoint("ads_spu_stats", TableShape(Seq(
        "spu_name" -> "SPU 名称", "order_count" -> "下单次数",
        "uu_count" -> "下单人数", "order_amount" -> "订单金额"))),
    // ActivityStatsController.java:14-61
    "/gmall/realtime/activity/stats" ->
      Endpoint("ads_activity_stats", TableShape(Seq(
        "activity_reduce_amount" -> "活动减免金额",
        "origin_total_amount" -> "原始金额总和", "subsidy_rate" -> "活动补贴率"))),
    // CouponStatsController.java:14-61
    "/gmall/realtime/coupon/stats" ->
      Endpoint("ads_coupon_stats", TableShape(Seq(
        "coupon_reduce_amount" -> "优惠券减免金额",
        "origin_total_amount" -> "原始金额总和",
        "coupon_subsidy_rate" -> "优惠券补贴率"))),
    // Legacy module gmall-publisher SugarController.java:45-94 (GMV
    // scalar + daily-active-by-channel series; series quoting follows
    // the 2022 module's uniform convention)
    "/api/sugar/gmv" -> Endpoint("ads_gmv", ScalarValue("gmv")),
    "/api/sugar/ch" ->
      Endpoint("ads_uv_by_ch_legacy", SeriesChart("ch", Seq("uv" -> "日活")))
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

  /** The same value as the reference's QUOTED series datum. */
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
    * reference controllers' empty-body contract). */
  def render(shape: Shape, fields: Array[String], rows: Seq[Row]): String = {
    if (rows.isEmpty) return ""
    shape match {
      case SeriesChart(label, series) =>
        val li = field(fields, label)
        val cats = rows.map(r => quoted(r.get(li))).mkString("[", ",", "]")
        val ser = series.map { case (c, name) =>
          val ci = field(fields, c)
          val data = rows.map(r => quoted(r.get(ci))).mkString("[", ",", "]")
          s"""{"name":"${jsonEscape(name)}","data":$data}"""
        }.mkString("[", ",", "]")
        s"""{"status":0,"msg":"","data":{"categories":$cats,"series":$ser}}"""
      case NameValue(label, value) =>
        val li = field(fields, label)
        val vi = field(fields, value)
        // quoted(...) instead of valueJson(_.toString): a null label
        // must render as "" (the series-datum null contract), not NPE
        val data = rows.map(r =>
          s"""{"name":${quoted(r.get(li))},"value":${valueJson(r.get(vi))}}""")
          .mkString("[", ",", "]")
        s"""{"status":0,"msg":"","data":$data}"""
      case ScalarValue(value) =>
        val vi = field(fields, value)
        s"""{"status":0,"msg":"","data":${valueJson(rows.head.get(vi))}}"""
      case TableShape(cols) =>
        val columns = cols.map { case (id, name) =>
          s"""{"name":"${jsonEscape(name)}","id":"${jsonEscape(id)}"}"""
        }.mkString("[", ",", "]")
        val data = rows.map { r =>
          cols.map { case (id, _) =>
            s""""${jsonEscape(id)}":${valueJson(r.get(field(fields, id)))}"""
          }.mkString("{", ",", "}")
        }.mkString("[", ",", "]")
        s"""{"status":0,"msg":"","data":{"columns":$columns,"rows":$data}}"""
    }
  }
}
