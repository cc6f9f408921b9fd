"""Portfolio: per-position aggregation of typed results.

Mirrors the reference's portfolio coverage (portfolio.py:8-67).
"""

import numpy as np
import pytest

from adrates_tpu.utils import (CurrencyTypes, CurveTypes, Date,
                               DayCountTypes, FrequencyTypes, RequestTypes,
                               SwapTypes)
from adrates_tpu.market import Portfolio
from adrates_tpu.models import Model
from adrates_tpu.trades.rates import OIS

VALUE_DT = Date(1, 1, 2024)


@pytest.fixture(scope="module")
def model():
    m = Model(VALUE_DT)
    m.build_curve("GBP_OIS_SONIA",
                  px_list=[5.0, 4.7, 4.3, 3.9, 3.87],
                  tenor_list=["6M", "1Y", "2Y", "5Y", "10Y"],
                  fixed_dcc_type=DayCountTypes.ACT_365F,
                  float_dc_type=DayCountTypes.ACT_365F)
    return m


def make_swap(tenor, leg_type, coupon):
    return OIS(VALUE_DT, tenor, leg_type, coupon, FrequencyTypes.ANNUAL,
               DayCountTypes.ACT_365F, CurveTypes.GBP_OIS_SONIA,
               CurrencyTypes.GBP, notional=1_000_000,
               float_dc_type=DayCountTypes.ACT_365F)


class TestPortfolio:
    def test_sum_of_values(self, model):
        swaps = [make_swap("2Y", SwapTypes.PAY, 0.04),
                 make_swap("5Y", SwapTypes.RECEIVE, 0.038),
                 make_swap("10Y", SwapTypes.PAY, 0.039)]
        pf = Portfolio([s.position(model) for s in swaps])
        res = pf.compute([RequestTypes.VALUE])
        total = sum(s.value(VALUE_DT, model.curves.GBP_OIS_SONIA, None)
                    for s in swaps)
        assert res.value.amount == pytest.approx(total, abs=1e-6)

    def test_sum_of_deltas_and_gammas(self, model):
        swaps = [make_swap("2Y", SwapTypes.PAY, 0.04),
                 make_swap("5Y", SwapTypes.RECEIVE, 0.038)]
        pf = Portfolio([s.position(model) for s in swaps])
        res = pf.compute([RequestTypes.VALUE, RequestTypes.DELTA,
                          RequestTypes.GAMMA])
        lad = np.zeros(5)
        g = np.zeros((5, 5))
        for s in swaps:
            r = s.position(model).compute([RequestTypes.DELTA,
                                           RequestTypes.GAMMA])
            lad += r.risk.risk_ladder
            g += r.gamma.risk_ladder
        np.testing.assert_allclose(res.risk.risk_ladder, lad, atol=1e-12)
        np.testing.assert_allclose(res.gamma.risk_ladder, g, atol=1e-12)

    def test_offsetting_positions_net_zero(self, model):
        pay = make_swap("5Y", SwapTypes.PAY, 0.04)
        rec = make_swap("5Y", SwapTypes.RECEIVE, 0.04)
        pf = Portfolio([pay.position(model), rec.position(model)])
        res = pf.compute([RequestTypes.VALUE, RequestTypes.DELTA])
        assert res.value.amount == pytest.approx(0.0, abs=1e-8)
        np.testing.assert_allclose(res.risk.risk_ladder, 0.0, atol=1e-10)

    def test_add_and_len(self, model):
        pf = Portfolio()
        pf.add(make_swap("2Y", SwapTypes.PAY, 0.04).position(model))
        assert len(pf) == 1
