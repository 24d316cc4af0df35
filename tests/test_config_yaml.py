"""YAML profile loading tests (reference config schema compatibility)."""

import textwrap

from dr_using_scv_od_tpu import config_yaml


def test_reference_schema(tmp_path):
    """A file in the reference's own key style must load correctly
    (config/semantickitti.yaml schema)."""
    doc = textwrap.dedent("""
        common:
          skip_: 5
        ssc:
          sensor_height_: 1.73
          min_dis_: 1.5
          max_dis_: 30.0
          range_res_: 0.4
          sector_res_: 1.2
          azimuth_res_: 2.0
          occupancy_: 0.4
          toBeClass_: 10
          intensity_diff_: 2.0
          intensity_cov_: 1.0
          max_z_: 0.8
          min_z_: -1.2
          car_square_: 30.0
          dynamic_label_: [252, 253, 254, 255, 256, 257, 258, 259]
    """)
    p = tmp_path / "ref.yaml"
    p.write_text(doc)
    cfg = config_yaml.load(p)
    assert cfg.grid.range_num == 72
    assert cfg.grid.sector_num == 300
    assert cfg.track.occupancy == 0.4
    assert cfg.seg.to_be_class == 10
    assert cfg.recog.car_square == 30.0
    assert cfg.dynamic_labels == (252, 253, 254, 255, 256, 257, 258, 259)
    assert cfg.skip == 5


def test_nested_schema_overrides(tmp_path):
    p = tmp_path / "own.yaml"
    p.write_text("track:\n  occupancy: 0.8\ngrid:\n  max_dis: 50.0\n")
    cfg = config_yaml.load(p)
    assert cfg.track.occupancy == 0.8
    assert cfg.grid.max_dis == 50.0
    # untouched fields keep profile defaults
    assert cfg.grid.range_res == 0.4
