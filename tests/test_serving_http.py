"""HTTP layer parity tests (reference app.py:144-308) via Flask test
client — no server process, same routes/verbs/status codes."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001

flask = pytest.importorskip("flask")

from a3_fp_bigdata_spark import serving_http  # noqa: E402


@pytest.fixture(scope="module")
def client(spark):
    app = serving_http.build_app(spark, SF0001)
    app.testing = True
    return app.test_client()


def test_check_data(client):
    r = client.get("/check_data")
    assert r.status_code == 200
    body = r.get_json()
    assert body["status"] == "ok"
    assert body["stats"]["cnt"] > 0
    assert len(body["sample"]) == 3


def test_categories_sorted_nonnull(client):
    r = client.get("/categories")
    cats = r.get_json()
    assert cats == sorted(cats) and None not in cats


def test_suggestions_min_chars_400(client):
    assert client.get("/search_app_suggestions?q=a").status_code == 400
    r = client.get("/search_app_suggestions?q=19")
    assert r.status_code == 200
    assert len(r.get_json()) <= 15


def test_details_found_and_404(client):
    hit = client.get("/app_details_by_id/1")
    assert hit.status_code == 200 and hit.get_json()["o_orderkey"] == 1
    assert client.get("/app_details_by_id/999999999").status_code == 404


def test_by_category_case_insensitive(client):
    r = client.get("/recommend_apps_by_category/2-HIGH")
    rows = r.get_json()
    assert rows and len(rows) <= 20
    prices = [row["o_totalprice"] for row in rows]
    assert prices == sorted(prices, reverse=True)


def test_top_apps_validates_sort(client):
    assert client.get("/top_apps?sort_by=nope").status_code == 400
    r = client.get("/top_apps?limit=5")
    rows = r.get_json()
    assert len(rows) == 5


def test_similar_and_cluster(client):
    r = client.get("/recommend_similar_app_by_name/5")
    assert r.status_code == 200
    peers = r.get_json()
    assert peers and all(p["vec_id"] != 5 for p in peers)
    labels = {p["label"] for p in peers}
    assert len(labels) == 1
    k = labels.pop()
    rows = client.get(f"/apps_in_cluster/{k}").get_json()
    assert rows and all(row["label"] == k for row in rows)
    assert client.get("/recommend_similar_app_by_name/999999").status_code == 404


def test_top_apps_limit_edge_cases(client):
    """limit=0 means zero rows (a count-free param probe), not one;
    negative and non-integer limits are 400; oversized limits clamp."""
    assert client.get("/top_apps?limit=0").get_json() == []
    assert client.get("/top_apps?limit=-3").status_code == 400
    assert client.get("/top_apps?limit=abc").status_code == 400
    assert len(client.get("/top_apps?limit=999").get_json()) <= 50
