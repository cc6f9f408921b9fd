"""Date class: Excel-serial parity, arithmetic, tenors, IMM/CDS dates.

Expected values verified bit-exact against the reference implementation
(cavour/utils/date.py) during development.
"""

import pytest

from adrates_tpu.utils import Date, LibError, datediff
from adrates_tpu.utils.date import dmy_to_serial, serial_to_dmy


class TestExcelSerial:
    def test_epoch(self):
        assert Date(1, 1, 1900).excel_dt() == 1

    def test_lotus_1900_bug(self):
        # Excel counts a fictitious 29 Feb 1900: 1 Mar 1900 is serial 61.
        assert Date(28, 2, 1900).excel_dt() == 59
        assert Date(1, 3, 1900).excel_dt() == 61

    def test_known_serials(self):
        assert Date(1, 1, 2024).excel_dt() == 45292
        assert Date(31, 12, 2023).excel_dt() == 45291
        assert Date(15, 6, 2023).excel_dt() == 45092
        assert Date(1, 1, 2000).excel_dt() == 36526

    def test_serial_roundtrip(self):
        for serial in [1, 59, 61, 1000, 36526, 45292, 73050]:
            d, m, y = serial_to_dmy(serial)
            assert dmy_to_serial(d, m, y) == serial

    def test_weekday_excel_convention(self):
        # Excel's weekday inherits the 1900 bug: 1 Jan 1900 reads as SUN.
        assert Date(1, 1, 1900).weekday() == Date.SUN
        # Post-bug dates are correct: 1 Jan 2024 was a Monday.
        assert Date(1, 1, 2024).weekday() == Date.MON
        assert Date(6, 1, 2024).weekday() == Date.SAT

    def test_subtraction(self):
        assert Date(15, 12, 2023) - Date(15, 6, 2023) == 183
        assert datediff(Date(1, 1, 2024), Date(1, 1, 2025)) == 366


class TestValidation:
    def test_rejects_pre_1900(self):
        with pytest.raises(LibError):
            Date(1, 1, 1899)

    def test_rejects_bad_day(self):
        with pytest.raises(LibError):
            Date(29, 2, 2023)
        with pytest.raises(LibError):
            Date(32, 1, 2024)

    def test_rejects_ymd_order(self):
        with pytest.raises(LibError):
            Date(2024, 1, 15)

    def test_leap_day_ok(self):
        assert Date(29, 2, 2024).d() == 29

    def test_rejects_feb_29_1900(self):
        # Real calendar: 1900 was not a leap year even though Excel thinks so
        with pytest.raises(LibError):
            Date(29, 2, 1900)


class TestArithmetic:
    def test_add_days(self):
        assert Date(31, 12, 2023).add_days(1) == Date(1, 1, 2024)
        assert Date(1, 3, 2024).add_days(-1) == Date(29, 2, 2024)

    def test_add_weekdays(self):
        # Friday + 1 weekday = Monday
        assert Date(5, 1, 2024).add_weekdays(1) == Date(8, 1, 2024)
        assert Date(8, 1, 2024).add_weekdays(-1) == Date(5, 1, 2024)
        assert Date(1, 1, 2024).add_weekdays(5) == Date(8, 1, 2024)

    def test_add_months_clamps_eom(self):
        assert Date(31, 1, 2024).add_months(1) == Date(29, 2, 2024)
        assert Date(31, 1, 2023).add_months(1) == Date(28, 2, 2023)
        assert Date(30, 11, 2023).add_months(3) == Date(29, 2, 2024)

    def test_add_months_negative(self):
        assert Date(31, 3, 2024).add_months(-1) == Date(29, 2, 2024)

    def test_add_years(self):
        assert Date(29, 2, 2024).add_years(1) == Date(28, 2, 2025)
        assert Date(15, 6, 2023).add_years(2) == Date(15, 6, 2025)


class TestTenor:
    def test_simple_tenors(self):
        dt = Date(15, 6, 2023)
        assert dt.add_tenor("1D") == Date(16, 6, 2023)
        assert dt.add_tenor("2W") == Date(29, 6, 2023)
        assert dt.add_tenor("3M") == Date(15, 9, 2023)
        assert dt.add_tenor("10Y") == Date(15, 6, 2033)
        assert dt.add_tenor("120M") == Date(15, 6, 2033)

    def test_on_tn(self):
        dt = Date(15, 6, 2023)
        assert dt.add_tenor("ON") == Date(16, 6, 2023)
        assert dt.add_tenor("TN") == Date(16, 6, 2023)

    def test_case_insensitive(self):
        assert Date(15, 6, 2023).add_tenor("1y") == Date(15, 6, 2024)

    def test_restores_day_of_month(self):
        # 31 Jan + 1M clamps to Feb EOM; +2M restores the 31st in March.
        assert Date(31, 1, 2024).add_tenor("2M") == Date(31, 3, 2024)
        # 30 Nov + 3M lands in Feb (29 in 2024) then 30 Apr on +5M
        assert Date(30, 11, 2023).add_tenor("5M") == Date(30, 4, 2024)

    def test_negative_tenor(self):
        assert Date(15, 6, 2023).add_tenor("-1M") == Date(15, 5, 2023)

    def test_list_tenor(self):
        out = Date(15, 6, 2023).add_tenor(["1M", "2M"])
        assert out == [Date(15, 7, 2023), Date(15, 8, 2023)]

    def test_bad_tenor_raises(self):
        with pytest.raises(LibError):
            Date(15, 6, 2023).add_tenor("1X")
        with pytest.raises(LibError):
            Date(15, 6, 2023).add_tenor(5)


class TestMarketDates:
    def test_eom(self):
        assert Date(15, 2, 2024).eom() == Date(29, 2, 2024)
        assert Date(15, 2, 2024).is_eom() is False
        assert Date(29, 2, 2024).is_eom() is True

    def test_next_imm(self):
        # 3rd Wednesday of March 2024 was the 20th
        assert Date(1, 2, 2024).next_imm_date() == Date(20, 3, 2024)
        assert Date(20, 3, 2024).next_imm_date() == Date(19, 6, 2024)

    def test_next_cds(self):
        assert Date(1, 2, 2024).next_cds_date() == Date(20, 3, 2024)
        assert Date(21, 3, 2024).next_cds_date() == Date(20, 6, 2024)

    def test_weekend(self):
        assert Date(6, 1, 2024).is_weekend()
        assert not Date(8, 1, 2024).is_weekend()


class TestVectorisation:
    def test_comparison_over_list(self):
        base = Date(15, 6, 2023)
        others = [Date(14, 6, 2023), Date(16, 6, 2023)]
        assert base.__gt__(others) == [True, False]

    def test_sub_over_list(self):
        base = Date(15, 6, 2023)
        others = [Date(14, 6, 2023), Date(10, 6, 2023)]
        assert base.__sub__(others) == [1, 5]
