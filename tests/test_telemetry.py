"""aggregate.funnel_counts + aggregate.cohort_retention."""
import datetime as dt

import pandas as pd
import pytest
import ray.data as rd

from axosyslog_ray.aggregate import cohort_retention, funnel_counts


def _ev(user, typ, day, hour=0):
    return {"user_id": user, "event_type": typ,
            "ts": dt.datetime(2024, 1, day, hour)}


class TestFunnel:
    def test_strict_order_required(self, ray_session):
        rows = [
            # u1: full ordered funnel
            _ev(1, "view", 1), _ev(1, "click", 2), _ev(1, "purchase", 3),
            # u2: click BEFORE first view -> stops at stage 1
            _ev(2, "click", 1), _ev(2, "view", 2), _ev(2, "purchase", 3),
            # u3: view+click only
            _ev(3, "view", 1), _ev(3, "click", 5),
            # u4: purchase before click -> stage 2 only
            _ev(4, "view", 1), _ev(4, "purchase", 2), _ev(4, "click", 3),
            # u5: no view at all
            _ev(5, "click", 1), _ev(5, "purchase", 2),
            # noise
            _ev(1, "error", 9), _ev(5, "signup", 1),
        ]
        out = funnel_counts(rd.from_items(rows).repartition(3),
                            ["view", "click", "purchase"]).to_pandas()
        got = dict(zip(out["stage"], out["n_users"]))
        assert got == {"1_view": 4, "2_click": 3, "3_purchase": 1}

    def test_min_ts_is_first_touch(self, ray_session):
        # u1 has a later second view; funnel uses the FIRST view
        rows = [_ev(1, "view", 5), _ev(1, "click", 3), _ev(1, "view", 1)]
        out = funnel_counts(rd.from_items(rows),
                            ["view", "click"]).to_pandas()
        got = dict(zip(out["stage"], out["n_users"]))
        assert got == {"1_view": 1, "2_click": 1}


class TestRetention:
    def test_triangle(self, ray_session):
        rows = [
            _ev(1, "view", 1), _ev(1, "view", 1, hour=9),  # same day dedup
            _ev(1, "click", 3),
            _ev(2, "view", 1), _ev(2, "view", 2),
            _ev(3, "view", 3),
        ]
        out = cohort_retention(rd.from_items(rows).repartition(2)).to_pandas()
        key = list(zip(out["cohort_day"], out["day_offset"], out["n_users"]))
        assert sorted(key) == [
            ("2024-01-01", 0, 2),   # u1, u2 day-0
            ("2024-01-01", 1, 1),   # u2 day-1
            ("2024-01-01", 2, 1),   # u1 day-2
            ("2024-01-03", 0, 1),   # u3 cohort
        ]

    def test_partitioning_invariant(self, ray_session):
        rows = [_ev(u, "view", 1 + (u * 3) % 7) for u in range(50)] + \
               [_ev(u, "click", 1 + (u * 5) % 9) for u in range(50)]
        a = cohort_retention(rd.from_items(rows)).to_pandas() \
            .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
        b = cohort_retention(rd.from_items(rows).repartition(7)).to_pandas() \
            .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
