import pytest

from tdei_backend_service_spark.backend_service import (Catalog, InputException,
                                                        ServiceNotFoundException,
                                                        dispatch,
                                                        validate_request)
from tdei_backend_service_spark.datagen import (synth_edges_df,
                                                synth_images_df)


@pytest.fixture(scope="module")
def catalog(spark):
    return Catalog(
        images=synth_images_df(spark, 500, with_bytes=False).cache(),
        edges=synth_edges_df(spark, 20).cache(),
    )


def _msg(service, **params):
    # queue-message shape from README.md:66-79
    return {"messageId": "m1", "messageType": service,
            "data": {"service": service, "parameters": params, "user_id": "u"}}


def test_validate_ok_and_strip_extras():
    svc, p = validate_request(_msg("bbox_intersect",
                                   tdei_dataset_id="ds-a",
                                   bbox=[1, 2, 3, 4], evil="x"))
    assert svc == "bbox_intersect"
    assert "evil" not in p  # removeAdditional semantics


def test_validate_missing_params():
    # mirrors backend-service.test.ts validation-failure paths
    with pytest.raises(InputException, match="required parameters"):
        validate_request(_msg("bbox_intersect", tdei_dataset_id="ds-a"))
    with pytest.raises(InputException, match="service"):
        validate_request({"data": {"parameters": {}}})


def test_validate_unknown_service():
    with pytest.raises(ServiceNotFoundException):
        validate_request(_msg("teleport", x=1))


def test_dispatch_bbox(catalog):
    out = dispatch(catalog, _msg("bbox_intersect", tdei_dataset_id="ds-a",
                                 bbox="-122.34,47.61,-122.30,47.66"))
    assert set(out) == {"images", "edges"}
    assert out["images"].count() > 0


def test_dispatch_spatial_join(catalog):
    out = dispatch(catalog, _msg(
        "spatial_join",
        target_dataset_id="ds-a", target_dimension="edge",
        source_dataset_id="ds-a", source_dimension="point",
        join_condition="ST_DWithin(geometry_target, geometry_source, 200)",
        aggregate=["count(*) as n"]))
    rows = out.collect()
    assert len(rows) == 20
    assert any(r.props["ext:n"] != "0" for r in rows)


def test_dispatch_tag_road(catalog):
    out = dispatch(catalog, _msg("dataset_tag_road",
                                 target_dataset_id="ds-a",
                                 source_dataset_id="ds-a",
                                 cutoff_m=500.0))
    assert out.count() == 500
    assert "nearest_edge_id" in out.columns


def test_dispatch_union(spark, catalog):
    out = dispatch(catalog, _msg("union_dataset",
                                 tdei_dataset_id_one="ds-a",
                                 tdei_dataset_id_two="ds-a"))
    # unioning a dataset with itself dedups every row to one survivor
    assert out.count() == 500


def test_dispatch_osm_export(catalog):
    path = dispatch(catalog, _msg("osw_osm_query", tdei_dataset_id="ds-a"))
    text = open(path).read()
    assert text.count("<node id=") == 500
    assert text.count("<way id=") == 20
