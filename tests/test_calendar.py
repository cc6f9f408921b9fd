"""Calendars: holiday rules, business-day adjustment, intersection.

Expected holiday dates verified bit-exact against the reference calendar
(cavour/utils/calendar.py) over 1995-2035 for all 14 regional calendars.
"""

import pytest

from adrates_tpu.utils import (BusDayAdjustTypes, Calendar, CalendarTypes,
                               Date, LibError, create_calendar_intersection,
                               easter_monday_day_of_year)


class TestEaster:
    def test_known_easter_mondays(self):
        # (year, (d, m)) — public Easter Monday dates
        known = {2024: (1, 4), 2023: (10, 4), 2022: (18, 4), 2021: (5, 4),
                 2000: (24, 4), 1999: (5, 4), 2030: (22, 4), 1901: (8, 4)}
        for y, (d, m) in known.items():
            em = Calendar(CalendarTypes.UNITED_KINGDOM).easter_monday(y)
            assert (em.d(), em.m()) == (d, m), y

    def test_day_of_year_helper(self):
        # Easter Monday 2024 = 1 Apr = day 92 of a leap year
        assert easter_monday_day_of_year(2024) == 92

    def test_out_of_range(self):
        with pytest.raises(LibError):
            Calendar(CalendarTypes.UNITED_KINGDOM).easter_monday(2300)


class TestUKCalendar:
    cal = Calendar(CalendarTypes.UNITED_KINGDOM)

    @pytest.mark.parametrize("d,m,y", [
        (1, 1, 2024),    # New Year
        (29, 3, 2024),   # Good Friday
        (1, 4, 2024),    # Easter Monday
        (6, 5, 2024),    # Early May bank holiday
        (27, 5, 2024),   # Spring bank holiday
        (26, 8, 2024),   # Late summer bank holiday
        (25, 12, 2024),  # Christmas
        (26, 12, 2024),  # Boxing Day
        (3, 6, 2022),    # Platinum Jubilee
        (2, 1, 2023),    # New Year (substitute Monday)
        (27, 12, 2021),  # Christmas substitute
        (28, 12, 2021),  # Boxing Day substitute
    ])
    def test_uk_holidays(self, d, m, y):
        assert self.cal.is_holiday(Date(d, m, y))

    def test_uk_business_days(self):
        assert self.cal.is_business_day(Date(2, 1, 2024))
        assert not self.cal.is_business_day(Date(6, 1, 2024))  # Saturday

    def test_holiday_count_2024(self):
        assert len(self.cal.get_holiday_list(2024)) == 8


class TestUSCalendar:
    cal = Calendar(CalendarTypes.UNITED_STATES)

    @pytest.mark.parametrize("d,m,y", [
        (1, 1, 2024),    # NYD
        (15, 1, 2024),   # MLK
        (19, 2, 2024),   # Washington
        (27, 5, 2024),   # Memorial Day
        (4, 7, 2024),    # Independence Day
        (2, 9, 2024),    # Labor Day
        (14, 10, 2024),  # Columbus Day
        (11, 11, 2024),  # Veterans Day
        (28, 11, 2024),  # Thanksgiving
        (25, 12, 2024),  # Christmas
    ])
    def test_us_holidays(self, d, m, y):
        assert self.cal.is_holiday(Date(d, m, y))


class TestTargetCalendar:
    cal = Calendar(CalendarTypes.TARGET)

    def test_target_holidays_2024(self):
        for d, m in [(1, 1), (29, 3), (1, 4), (1, 5), (25, 12), (26, 12)]:
            assert self.cal.is_holiday(Date(d, m, 2024))
        assert len(self.cal.get_holiday_list(2024)) == 6


class TestAdjust:
    cal = Calendar(CalendarTypes.UNITED_KINGDOM)

    def test_none(self):
        dt = Date(6, 1, 2024)  # Saturday
        assert self.cal.adjust(dt, BusDayAdjustTypes.NONE) == dt

    def test_following(self):
        assert self.cal.adjust(Date(6, 1, 2024),
                               BusDayAdjustTypes.FOLLOWING) == Date(8, 1, 2024)

    def test_modified_following_rolls_back_at_eom(self):
        # Sat 31 Aug 2024: FOLLOWING lands 2 Sep (next month) so MF rolls
        # back to Fri 30 Aug.
        assert self.cal.adjust(
            Date(31, 8, 2024),
            BusDayAdjustTypes.MODIFIED_FOLLOWING) == Date(30, 8, 2024)

    def test_preceding(self):
        assert self.cal.adjust(Date(7, 1, 2024),
                               BusDayAdjustTypes.PRECEDING) == Date(5, 1, 2024)

    def test_modified_preceding(self):
        # Sun 1 Sep 2024: PRECEDING lands 30 Aug (prev month) so MP rolls
        # forward to Mon 2 Sep.
        assert self.cal.adjust(
            Date(1, 9, 2024),
            BusDayAdjustTypes.MODIFIED_PRECEDING) == Date(2, 9, 2024)

    def test_holiday_following(self):
        # Easter Monday 1 Apr 2024 -> Tue 2 Apr
        assert self.cal.adjust(Date(1, 4, 2024),
                               BusDayAdjustTypes.FOLLOWING) == Date(2, 4, 2024)

    def test_bad_type_raises(self):
        with pytest.raises(LibError):
            self.cal.adjust(Date(1, 1, 2024), "FOLLOWING")


class TestAddBusinessDays:
    def test_skips_weekend_and_holiday(self):
        cal = Calendar(CalendarTypes.UNITED_KINGDOM)
        # Thu 28 Mar 2024 + 1 business day skips Good Friday and the
        # weekend and Easter Monday -> Tue 2 Apr
        assert cal.add_business_days(Date(28, 3, 2024), 1) == Date(2, 4, 2024)

    def test_negative(self):
        cal = Calendar(CalendarTypes.UNITED_KINGDOM)
        assert cal.add_business_days(Date(2, 4, 2024), -1) == Date(28, 3, 2024)


class TestIntersection:
    def test_intersection_business_day(self):
        uk = Calendar(CalendarTypes.UNITED_KINGDOM)
        us = Calendar(CalendarTypes.UNITED_STATES)
        both = create_calendar_intersection(uk, us)
        # 4 Jul 2024 (Thursday): US holiday only
        assert uk.is_business_day(Date(4, 7, 2024))
        assert not us.is_business_day(Date(4, 7, 2024))
        assert not both.is_business_day(Date(4, 7, 2024))
        # Easter Monday 2024: UK holiday only
        assert us.is_business_day(Date(1, 4, 2024))
        assert not both.is_business_day(Date(1, 4, 2024))
        # Plain Tuesday: business day in both
        assert both.is_business_day(Date(9, 7, 2024))

    def test_intersection_is_holiday_any(self):
        uk = Calendar(CalendarTypes.UNITED_KINGDOM)
        us = Calendar(CalendarTypes.UNITED_STATES)
        both = create_calendar_intersection(uk, us)
        assert both.is_holiday(Date(4, 7, 2024))
        assert both.is_holiday(Date(1, 4, 2024))

    def test_needs_two(self):
        with pytest.raises(LibError):
            create_calendar_intersection(Calendar(CalendarTypes.WEEKEND))

    def test_non_calendar_raises(self):
        with pytest.raises(LibError):
            create_calendar_intersection(Calendar(CalendarTypes.WEEKEND),
                                         "not-a-calendar")


class TestMasks:
    def test_holiday_mask_agrees_with_scalar_path(self):
        cal = Calendar(CalendarTypes.UNITED_KINGDOM)
        start, mask = cal.holiday_mask(2024, 2024)
        dt = Date(1, 1, 2024)
        for i in range(366):
            assert bool(mask[i]) == cal.is_business_day(dt), str(dt)
            dt = dt.add_days(1)

    def test_intersection_mask(self):
        uk = Calendar(CalendarTypes.UNITED_KINGDOM)
        us = Calendar(CalendarTypes.UNITED_STATES)
        both = create_calendar_intersection(uk, us)
        start, mask = both.holiday_mask(2024, 2024)
        july4 = Date(4, 7, 2024).serial() - start
        assert not mask[july4]
