"""Market data adapters: Bloomberg fetch (optional) + FX cross routing.

Parity: /root/reference/cavour/marketdata/market_data_engine.py
(MarketCurveBuilder 16-281, FXRoutingEngine Dijkstra routing 282-455).
Bloomberg access is gated on the optional ``xbbg`` package; everything
else works without it.
"""

from __future__ import annotations

import heapq
import math
from typing import Dict, List, Optional, Tuple, Union

from ..utils.calendar import BusDayAdjustTypes
from ..utils.currency import CurrencyTypes
from ..utils.date import Date
from ..utils.error import LibError


def _require_xbbg():
    try:
        from xbbg import blp  # noqa: F401
        return blp
    except ImportError as exc:
        raise LibError(
            "Bloomberg access requires the optional 'xbbg' package "
            "(and a Bloomberg terminal connection).") from exc


class MarketCurveBuilder:
    """Fetches quotes from Bloomberg and shapes them into the kwargs
    Model.build_curve / build_xccy_curve expect."""

    def __init__(self, market_data: dict, fx_market_data: dict):
        self._market_data = market_data
        self._fx_market_data = fx_market_data

    # ------------------------------------------------------------------

    def _fetch_last_price(self, tickers: List[str], value_dt: Date
                          ) -> Dict[str, float]:
        blp = _require_xbbg()
        start = value_dt.datetime()
        df = blp.bdh(tickers=tickers, flds=["PX_LAST"], start_date=start,
                     end_date=start)
        out = {}
        for ticker in tickers:
            try:
                out[ticker] = float(df[ticker]["PX_LAST"].iloc[-1])
            except Exception:
                raise LibError(f"No Bloomberg price for {ticker} on "
                               f"{value_dt}")
        return out

    def get_curve_inputs(self, curve_name: str, value_dt: Date) -> dict:
        """kwargs for Model.build_curve from the configured ticker map."""
        if curve_name not in self._market_data:
            raise KeyError(f"Unknown curve {curve_name}")
        config = self._market_data[curve_name]
        tickers = config["tickers"]
        tenor_list = [t for t in tickers if t != "1D"]
        prices = self._fetch_last_price([tickers[t] for t in tenor_list],
                                        value_dt)
        px_list = [prices[tickers[t]] for t in tenor_list]
        conv = config["conventions"]
        return dict(
            name=curve_name,
            px_list=px_list,
            tenor_list=tenor_list,
            fixed_dcc_type=conv["fixed_day_count"],
            fixed_freq_type=conv["fixed_frequency"],
            float_freq_type=conv["float_frequency"],
            float_dc_type=conv["float_day_count"],
            bus_day_type=conv["business_day_adjustment"],
            interp_type=conv["interp_type"],
            payment_lag=conv["payment_lag"])

    def get_fx_rates(self, fx_pairs: Union[str, List[str]],
                     value_dt: Date) -> dict:
        """{pair: {base, quote, ticker, price}} for the requested pairs
        ("ALL" fetches every configured pair)."""
        if isinstance(fx_pairs, str):
            fx_pairs = [fx_pairs]
        if fx_pairs == ["ALL"]:
            fx_pairs = list(self._fx_market_data.keys())
        tickers = [self._fx_market_data[p]["ticker"] for p in fx_pairs]
        prices = self._fetch_last_price(tickers, value_dt)
        out = {}
        for pair in fx_pairs:
            cfg = self._fx_market_data[pair]
            out[pair] = {
                "base": CurrencyTypes[cfg["base"]],
                "quote": CurrencyTypes[cfg["quote"]],
                "ticker": cfg["ticker"],
                "price": prices[cfg["ticker"]],
            }
        return out

    def get_xccy_curve_inputs(self, curve_name: str, value_dt: Date
                              ) -> dict:
        """kwargs for Model.build_xccy_curve."""
        if curve_name not in self._market_data:
            raise KeyError(f"Unknown curve {curve_name}")
        config = self._market_data[curve_name]
        tickers = config["tickers"]
        tenor_list = list(tickers.keys())
        prices = self._fetch_last_price([tickers[t] for t in tenor_list],
                                        value_dt)
        basis_spreads = [prices[tickers[t]] for t in tenor_list]
        fx = self.get_fx_rates([config["fx_pair"]], value_dt)
        conv = config["conventions"]
        return dict(
            name=curve_name,
            domestic_curve_name=config["domestic_curve"],
            foreign_curve_name=config["foreign_curve"],
            basis_spreads=basis_spreads,
            tenor_list=tenor_list,
            spot_fx=fx[config["fx_pair"]]["price"],
            domestic_freq_type=conv["domestic_frequency"],
            foreign_freq_type=conv["foreign_frequency"],
            domestic_dc_type=conv["domestic_day_count"],
            foreign_dc_type=conv["foreign_day_count"],
            bus_day_type=conv["business_day_adjustment"],
            interp_type=conv["interp_type"])


class FXRoutingEngine:
    """FX cross rates via Dijkstra over the currency-pair graph, with
    per-currency routing overrides."""

    def __init__(self, fx_params: Optional[dict] = None):
        self._fx_rates: Dict[str, float] = {}
        self._graph: Dict[str, Dict[str, float]] = {}
        self._overrides: Dict[str, str] = {}
        if fx_params:
            for pair, rec in fx_params.items():
                price = rec["price"] if isinstance(rec, dict) else rec
                self.set_fx_rate(pair, price)

    def set_fx_rate(self, pair: str, rate: float):
        pair = pair.upper()
        if rate <= 0:
            raise LibError(f"FX rate must be positive: {pair}={rate}")
        ccy1, ccy2 = pair[:3], pair[3:]
        self._fx_rates[pair] = rate
        self._graph.setdefault(ccy1, {})[ccy2] = rate
        self._graph.setdefault(ccy2, {})[ccy1] = 1.0 / rate

    def set_bulk_fx_rates(self, fx_dict: Dict[str, float]):
        for pair, rate in fx_dict.items():
            self.set_fx_rate(pair, rate)

    def set_override(self, ccy: str, via: str):
        self._overrides[ccy.upper()] = via.upper()

    # ------------------------------------------------------------------

    def _dijkstra(self, src: str, tgt: str
                  ) -> Tuple[Optional[float], List[str]]:
        """Min-hop/min-log-cost path src -> tgt; returns (rate, path)."""
        src, tgt = src.upper(), tgt.upper()
        if src not in self._graph or tgt not in self._graph:
            return None, []
        visited = set()
        heap = [(0.0, src, [src], 1.0)]
        while heap:
            cost, current, path, rate = heapq.heappop(heap)
            if current == tgt:
                return rate, path
            if current in visited:
                continue
            visited.add(current)
            for nxt, edge in self._graph[current].items():
                if nxt not in visited:
                    heapq.heappush(heap, (cost + 1.0, nxt, path + [nxt],
                                          rate * edge))
        return None, []

    def get_cross_rate(self, base: str, quote: str) -> float:
        """Rate converting 1 unit of ``base`` into ``quote``."""
        base, quote = base.upper(), quote.upper()
        if base == quote:
            return 1.0
        # overrides force an intermediate hop
        if base in self._overrides:
            via = self._overrides[base]
            return self.get_cross_rate(base if via == base else via,
                                       quote) * self._leg_rate(base, via)
        rate, path = self._dijkstra(base, quote)
        if rate is None:
            raise LibError(f"No FX route from {base} to {quote}")
        return rate

    def _leg_rate(self, src: str, via: str) -> float:
        rate, _ = self._dijkstra(src, via)
        if rate is None:
            raise LibError(f"No FX route from {src} to {via}")
        return rate

    def rate(self, pair: str) -> float:
        """Rate for a 6-char pair string via direct quote or routing."""
        pair = pair.upper()
        if pair in self._fx_rates:
            return self._fx_rates[pair]
        return self.get_cross_rate(pair[:3], pair[3:])

    def get_path(self, base: str, quote: str) -> List[str]:
        _, path = self._dijkstra(base, quote)
        return path

    def get_cross_rate_with_path(self, base: str, quote: str):
        """(rate, conversion path) — (None, []) when no route exists
        (parity: reference market_data_engine.py:424-455)."""
        base, quote = base.upper(), quote.upper()
        if base == quote:
            return 1.0, [base]
        rate, path = self._dijkstra(base, quote)
        if rate is None:
            return None, []
        return rate, path
