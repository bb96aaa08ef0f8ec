package graft.sched

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import java.time.{LocalDateTime, ZoneOffset}

class CronSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.toString)
  }

  private def ms(y: Int, mo: Int, d: Int, h: Int, mi: Int, s: Int = 0): Long =
    LocalDateTime.of(y, mo, d, h, mi, s).toInstant(ZoneOffset.UTC).toEpochMilli

  test("parses fields: lists, ranges, steps, wildcard") {
    val c = CronSchedule("*/15 9-17 1,15 * 1-5")
    assert(c.minutes == Set(0, 15, 30, 45))
    assert(c.hours == (9 to 17).toSet)
    assert(c.doms == Set(1, 15))
    assert(c.months == (1 to 12).toSet)
    assert(c.dows == (1 to 5).toSet)
  }

  test("rejects malformed expressions with field-level messages") {
    assert(intercept[IllegalArgumentException] {
      CronSchedule("61 * * * *") }.getMessage.contains("minute"))
    assert(intercept[IllegalArgumentException] {
      CronSchedule("* * * *") }.getMessage.contains("5 fields"))
    assert(intercept[IllegalArgumentException] {
      CronSchedule("* * 0 * *") }.getMessage.contains("day-of-month"))
    assert(intercept[IllegalArgumentException] {
      CronSchedule("5-2 * * * *") }.getMessage.contains("inverted"))
  }

  test("lastDue finds the latest matching minute at or before now") {
    val daily = CronSchedule("30 6 * * *") // 06:30 every day
    assert(daily.lastDue(ms(2026, 8, 12, 7, 0)) == Some(ms(2026, 8, 12, 6, 30)))
    assert(daily.lastDue(ms(2026, 8, 12, 6, 30)) == Some(ms(2026, 8, 12, 6, 30)))
    assert(daily.lastDue(ms(2026, 8, 12, 6, 29)) == Some(ms(2026, 8, 11, 6, 30)))
    // seconds truncate toward the containing minute
    assert(daily.lastDue(ms(2026, 8, 12, 6, 30, 59)) == Some(ms(2026, 8, 12, 6, 30)))
  }

  test("day-of-week: 0 and 7 are both Sunday") {
    // 2026-08-09 is a Sunday
    for (expr <- Seq("0 12 * * 0", "0 12 * * 7")) {
      assert(CronSchedule(expr).lastDue(ms(2026, 8, 12, 0, 0)) ==
        Some(ms(2026, 8, 9, 12, 0)), expr)
    }
  }

  test("vixie dom/dow OR rule when both restricted") {
    // dom=10 OR friday; 2026-08-12 is a Wednesday, 2026-08-07 a Friday
    val c = CronSchedule("0 0 10 * 5")
    assert(c.lastDue(ms(2026, 8, 12, 6, 0)) == Some(ms(2026, 8, 10, 0, 0))) // dom hit
    assert(c.lastDue(ms(2026, 8, 9, 6, 0)) == Some(ms(2026, 8, 7, 0, 0)))   // dow hit
  }

  test("month restriction skips back across months") {
    val feb = CronSchedule("0 0 29 2 *") // Feb 29 (leap only)
    assert(feb.lastDue(ms(2026, 8, 12, 0, 0)) == Some(ms(2024, 2, 29, 0, 0)))
  }

  test("isDue contract matches Schedule: strictly-after-last-tick") {
    val c = CronSchedule("0 * * * *") // hourly on the hour
    val tick = ms(2026, 8, 12, 9, 0)
    assert(c.isDue(ms(2026, 8, 12, 9, 30), None))
    assert(!c.isDue(ms(2026, 8, 12, 9, 30), Some(tick)))
    assert(c.isDue(ms(2026, 8, 12, 10, 0), Some(tick)))
  }

  test("property: */n cron ≡ fixed-interval Schedule on minute-aligned grids") {
    // every-n-minutes cron within an hour ≡ Schedule(n minutes) anchored at
    // the epoch, for n dividing 60 (cron resets at each hour boundary)
    val gen: Gen[(Int, Long)] = for {
      n <- Gen.oneOf(1, 2, 5, 10, 15, 30)
      now <- Gen.choose(0L, ms(2030, 1, 1, 0, 0))
    } yield (n, now)
    check(Prop.forAll(gen) { case (n, now) =>
      val cron = CronSchedule(s"*/$n * * * *")
      val interval = Schedule(n * 60000L)
      val lastTick = cron.lastDue(now).map(_ - n * 60000L)
      cron.lastDue(now) == interval.lastDue(now) &&
        cron.isDue(now, lastTick) == interval.isDue(now, lastTick)
    })
  }

  test("property: lastDue is minute-aligned, <= now, and matches the fields") {
    val exprs = Seq("*/5 * * * *", "0 */2 * * *", "30 6 * * *", "0 12 * * 1",
      "15 8 1 * *", "0 0 1 1 *")
    val gen: Gen[(String, Long)] = for {
      e <- Gen.oneOf(exprs)
      now <- Gen.choose(ms(2000, 1, 1, 0, 0), ms(2030, 1, 1, 0, 0))
    } yield (e, now)
    check(Prop.forAll(gen) { case (e, now) =>
      val c = CronSchedule(e)
      c.lastDue(now).exists { t =>
        val ldt = LocalDateTime.ofInstant(java.time.Instant.ofEpochMilli(t), ZoneOffset.UTC)
        t <= now && t % 60000 == 0 &&
          c.minutes.contains(ldt.getMinute) && c.hours.contains(ldt.getHour) &&
          c.months.contains(ldt.getMonthValue)
      }
    })
  }
}
