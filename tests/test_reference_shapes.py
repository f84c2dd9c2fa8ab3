"""Golden test on reference-shaped fixtures (FIXTURES.md): the exact
ingestion semantics every reference notebook applies — sentinel drops,
``yyyy-MM`` period parsing, availability shift, text normalization of
product names, A–E rating mapping, conditional pivot with ``ind_*``
holding indicators — verified against hand-computed values."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from databricks_demo_feature_store_spark.functions import (
    choose_columns_as_value,
    normalize_string_values,
    shift_date,
    standardize_na_values,
)
from databricks_demo_feature_store_spark.operators import conditional_pivot


def test_reference_shaped_payment_pipeline(spark):
    pagos = spark.createDataFrame(
        [
            # id_cliente, periodo, monto_pagado, calificacion_sistema, producto
            ("1", "2024-01", 100.0, "A", "tarjeta de credito"),
            ("1", "2024-01", 50.0, "C", "credito hipotecario"),
            ("1", "2024-02", 75.0, "B", "tarjeta de credito"),
            ("2", "2024-01", 200.0, "E", "credito vehicular"),
            ("999999999", "2024-01", 10.0, "A", "tarjeta de credito"),  # sentinel
            (None, "2024-01", 10.0, "A", "tarjeta de credito"),  # NULL id
            ("2", "2024-02", 30.0, None, "credito vehicular"),  # NULL rating
        ],
        ["id_cliente", "periodo", "monto_pagado", "calificacion_sistema", "producto"],
    )

    # 1. sentinel standardization + drop (fs_cus_credit_risk.py:78-82)
    cleaned = standardize_na_values(pagos, ["id_cliente"]).na.drop(
        subset=["id_cliente"]
    )
    assert cleaned.count() == 5

    # 2. event_dt from 'yyyy-MM' periodo; availability shift +1 month
    #    (fs_cus_payment_behavior.py:82-95)
    dated = shift_date(
        cleaned.withColumn("event_dt", F.to_date("periodo", "yyyy-MM")),
        "event_dt",
        "release_dt",
        months_to_add=1,
    )

    # 3. product-name normalization → pivot-ready categories
    #    (utils.py:382-421; matches fs_cus_holding_products.py:607-612)
    normed = normalize_string_values(dated, ["producto"])
    cats = {r["producto"] for r in normed.select("producto").distinct().collect()}
    assert cats == {"tarjeta_de_credito", "credito_hipotecario", "credito_vehicular"}

    # 4. A..E → 1..5 rating CASE (fs_cus_credit_risk.py:64-74)
    rated = choose_columns_as_value(
        normed,
        "rating_num",
        cases=[
            {"condition": f"calificacion_sistema = '{letter}'", "value": i + 1}
            for i, letter in enumerate("ABCDE")
        ],
        default=0,
        cast_to="int",
    )

    # 5. per-(cliente, month) conditional pivot + holding indicators
    out = conditional_pivot(
        rated.withColumn("monto_dec", F.col("monto_pagado").cast("decimal(25,2)")),
        group_by=["id_cliente", "release_dt"],
        pivot_column="producto",
        categories=["tarjeta_de_credito", "credito_hipotecario", "credito_vehicular"],
        value_column="monto_dec",
        prefix="amt_",
        indicators=True,
        extra_operations=[
            {"column": "rating_num", "operation": "max", "alias": "worst_rating"},
        ],
    )
    rows = {
        (r["id_cliente"], r["release_dt"]): r
        for r in out.collect()
    }

    c1_feb = rows[("1", dt.date(2024, 2, 1))]  # Jan data available in Feb
    assert float(c1_feb["amt_tarjeta_de_credito"]) == 100.0
    assert float(c1_feb["amt_credito_hipotecario"]) == 50.0
    assert float(c1_feb["amt_credito_vehicular"]) == 0.0
    assert c1_feb["ind_tarjeta_de_credito"] and c1_feb["ind_credito_hipotecario"]
    assert not c1_feb["ind_credito_vehicular"]
    assert c1_feb["worst_rating"] == 3  # C

    c1_mar = rows[("1", dt.date(2024, 3, 1))]
    assert float(c1_mar["amt_tarjeta_de_credito"]) == 75.0
    assert c1_mar["worst_rating"] == 2  # B

    c2_feb = rows[("2", dt.date(2024, 2, 1))]
    assert c2_feb["worst_rating"] == 5  # E
    c2_mar = rows[("2", dt.date(2024, 3, 1))]
    assert c2_mar["worst_rating"] == 0  # NULL rating → default 0
    assert float(c2_mar["amt_credito_vehicular"]) == 30.0
