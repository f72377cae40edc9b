"""Executable documentation of the TPC-H completionist claim
(queries/tpch_shapes.py module doc): every one of the 22 logical plan
shapes maps to a registered, oracle-paired query. The mapping is pinned
here so a rename or removal breaks CI instead of silently invalidating
the claim the docs make.
"""

from __future__ import annotations

from etl_covid19_brasil_spark import registry

TPCH_SHAPE_MAP = {
    1: "agg_groupby_pricing",
    2: "join_min_cost_supplier",
    3: "agg_shipping_priority_topk",
    4: "agg_order_priority_check",
    5: "join_multiway_local_supplier",
    6: "agg_revenue_forecast_band",
    7: "agg_trade_volume_nation_pairs",
    8: "agg_market_share",
    9: "agg_product_type_profit",
    10: "agg_returned_item_topk",
    11: "agg_important_stock_share",
    12: "agg_ship_latency_priority",
    13: "agg_count_of_counts",
    14: "agg_promo_revenue_ratio",
    15: "join_top_revenue_supplier",
    16: "agg_supplier_variety_count",
    17: "agg_small_quantity_revenue",
    18: "agg_large_volume_customers",
    19: "filter_disjunctive_bands",
    20: "join_excess_supply_parts",
    21: "join_multi_exists_waiting",
    22: "agg_idle_customer_balance",
}


def test_all_22_tpch_shapes_registered_and_oracle_paired():
    specs = registry.all_specs()
    assert sorted(TPCH_SHAPE_MAP) == list(range(1, 23))
    for qnum, name in TPCH_SHAPE_MAP.items():
        assert name in specs, (qnum, name)
        # every shape is exact-checkable — none is rows-only
        assert specs[name].oracle, (qnum, name)
