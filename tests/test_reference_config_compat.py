"""Drop-in compatibility: the reference's shipped example config
(config/models.yml in tarantool/sdvg) must parse, validate, and
generate unmodified — ru locales, cross-model FK, uuid distinct
control, write_to_output partitions, Go-layout datetime_format and all.
"""

from __future__ import annotations

import os

import pytest

REF_CONFIG = "/root/reference/config/models.yml"


@pytest.mark.skipif(not os.path.exists(REF_CONFIG), reason="reference not present")
def test_reference_example_config_generates(spark, tmp_path):
    import yaml

    from sdvg_spark.config.model import parse_config
    from sdvg_spark.engine import Engine

    raw = yaml.safe_load(open(REF_CONFIG))
    raw["output"] = {"type": "csv", "dir": str(tmp_path / "out"),
                     "params": raw.get("output", {}).get("params", {})}
    cfg = parse_config(raw)
    assert sorted(cfg.models) == ["token", "user"]

    eng = Engine(cfg)
    user = eng.model_df(spark, "user")
    assert user.count() == cfg.models["user"].rows_count
    token = eng.model_df(spark, "token")
    assert token.count() == cfg.models["token"].rows_count

    rows = user.limit(200).collect()
    # ru-locale logical types actually produce Cyrillic values
    assert any(any("Ѐ" <= ch <= "ӿ" for ch in r["first_name_ru"]) for r in rows)
    # FK containment: token.user_id within user.id's value space
    uid_min, uid_max = 1, 50_000_000
    for r in token.select("user_id").limit(200).collect():
        assert uid_min <= r["user_id"] <= uid_max
