package graft.sched

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

/** Five-field cron schedule (minute hour day-of-month month day-of-week) —
  * the reference stores schedule strings on resources (SourceVariant /
  * FeatureVariant `schedule`, metadata.proto:500-525) and the coordinator
  * evaluates them; here evaluation is the same pure due-time contract as the
  * fixed-interval [[Schedule]] (`lastDue` / `isDue`), so the caller's
  * refresh loop can drive either form interchangeably.
  *
  * Field syntax: `*`, lists `a,b`, ranges `a-b`, steps `*&#47;n` and `a-b/n`.
  * Day-of-month/day-of-week follow the classic (vixie) rule: when BOTH are
  * restricted the day matches if EITHER matches; day-of-week 0 and 7 are both
  * Sunday. All evaluation is UTC.
  */
final case class CronSchedule(minutes: Set[Int], hours: Set[Int],
                              doms: Set[Int], months: Set[Int], dows: Set[Int],
                              domStar: Boolean, dowStar: Boolean,
                              expr: String) {

  private def dayMatches(d: LocalDate): Boolean = {
    if (!months.contains(d.getMonthValue)) return false
    val domOk = doms.contains(d.getDayOfMonth)
    val dowOk = dows.contains(d.getDayOfWeek.getValue % 7) // java Sun=7 → 0
    if (domStar && dowStar) true
    else if (domStar) dowOk
    else if (dowStar) domOk
    else domOk || dowOk
  }

  /** Latest due tick (minute-aligned, UTC) at or before `nowMs`; None only
    * for expressions with no occurrence in the past ~5 years (e.g. Feb 30). */
  def lastDue(nowMs: Long): Option[Long] = {
    val now = LocalDateTime.ofInstant(Instant.ofEpochMilli(nowMs), ZoneOffset.UTC)
    val hmDesc = (for (h <- hours.toSeq; m <- minutes.toSeq) yield (h, m))
      .sorted(Ordering[(Int, Int)].reverse)
    var day = now.toLocalDate
    var back = 0
    while (back < 366 * 5) {
      if (dayMatches(day)) {
        val limit: Option[(Int, Int)] =
          if (day == now.toLocalDate) Some((now.getHour, now.getMinute)) else None
        val hit = hmDesc.find { case (h, m) =>
          limit.forall { case (lh, lm) => h < lh || (h == lh && m <= lm) } }
        hit.foreach { case (h, m) =>
          return Some(day.atTime(h, m).toInstant(ZoneOffset.UTC).toEpochMilli)
        }
      }
      day = day.minusDays(1)
      back += 1
    }
    None
  }

  /** Same contract as [[Schedule.isDue]]: due iff a tick ≤ now exists that is
    * strictly after the last completed tick. */
  def isDue(nowMs: Long, lastRunTickMs: Option[Long]): Boolean =
    lastDue(nowMs).exists(t => lastRunTickMs.forall(_ < t))
}

object CronSchedule {

  /** Parse a 5-field cron expression; throws IllegalArgumentException with a
    * field-level message on malformed input. */
  def apply(expr: String): CronSchedule = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5,
      s"cron '$expr': expected 5 fields (minute hour dom month dow), got ${fields.length}")
    val minutes = parseField(fields(0), 0, 59, "minute")
    val hours = parseField(fields(1), 0, 23, "hour")
    val doms = parseField(fields(2), 1, 31, "day-of-month")
    val months = parseField(fields(3), 1, 12, "month")
    // dow range 0-7; 7 normalized to 0 (both Sunday)
    val dowsRaw = parseField(fields(4), 0, 7, "day-of-week")
    val dows = dowsRaw.map(d => if (d == 7) 0 else d)
    new CronSchedule(minutes, hours, doms, months, dows,
      domStar = fields(2) == "*", dowStar = fields(4) == "*", expr)
  }

  private def parseField(f: String, lo: Int, hi: Int, name: String): Set[Int] = {
    def bad(msg: String) =
      throw new IllegalArgumentException(s"cron $name field '$f': $msg")
    def num(s: String): Int = {
      val v = try s.toInt catch { case _: NumberFormatException => bad(s"'$s' is not a number") }
      if (v < lo || v > hi) bad(s"$v out of range [$lo,$hi]")
      v
    }
    f.split(",").toSeq.flatMap { part =>
      val (rangePart, step) = part.split("/") match {
        case Array(r) => (r, 1)
        case Array(r, s) =>
          val st = num2(s, bad); if (st <= 0) bad(s"step $st must be positive"); (r, st)
        case _ => bad("too many '/'")
      }
      val (from, to) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") => r.split("-") match {
          case Array(a, b) =>
            val (x, y) = (num(a), num(b)); if (x > y) bad(s"range $x-$y inverted"); (x, y)
          case _ => bad("malformed range")
        }
        case single =>
          val v = num(single)
          if (step == 1) (v, v) else (v, hi) // "a/n" = from a to max by n
      }
      (from to to by step)
    }.toSet
  }

  private def num2(s: String, bad: String => Nothing): Int =
    try s.toInt catch { case _: NumberFormatException => bad(s"step '$s' is not a number") }
}
