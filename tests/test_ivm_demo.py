"""Incremental view maintenance stays exact across the full change mix —
including a metadata-only merge-on-read DELETE (mask-aware CDC)."""


def test_incremental_view_equals_recompute(ray_session):
    from aws_medallion_datalake_ray.pipelines.demos import demo_incremental_view

    df = demo_incremental_view("/root/testdata/sf0.001")
    assert bool(df["incremental_equals_recompute"].iloc[0])
    assert int(df["feed_rows"].iloc[0]) > 0
