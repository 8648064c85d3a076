"""MJCF surgery tests (reference utils/xml_utils.py parity)."""
import xml.etree.ElementTree as ET

from myosuite_mjx_tpu.utils import xml_utils

SCENE = """<mujoco model="scene">
  <!-- scene comment -->
  <worldbody>
    <body name="table" pos="0 0 0.5">
      <geom type="box" size="0.5 0.5 0.02"/>
    </body>
    <body name="mount" pos="1 0 0">
      <body name="arm" euler="0 0 1.57">
        <geom type="capsule" size="0.02 0.2"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""

DONOR = """<mujoco model="donor">
  <asset><texture name="skin" type="2d"/></asset>
  <worldbody><body name="ball"><geom type="sphere" size="0.03"/></body>
  </worldbody>
</mujoco>"""


def test_parse_preserves_comments():
  tree = xml_utils.parse_mjcf(xml_str=SCENE)
  s = xml_utils.to_xml_str(tree)
  assert "scene comment" in s


def test_merge_appends_donor_sections():
  merged = xml_utils.merge_mjcf(SCENE, DONOR)
  root = ET.fromstring(merged)
  assert root.find("asset/texture") is not None
  # donor worldbody grafted alongside the receiver's
  assert len(root.findall(".//body[@name='ball']")) == 1


def test_merge_into_named_node():
  merged = xml_utils.merge_mjcf(SCENE, DONOR, receiver_node="worldbody",
                                destination="tree")
  wb = merged.getroot().find("worldbody")
  # donor's top-level sections land under the named node (ref semantics)
  assert wb.find(".//body[@name='ball']") is not None
  assert wb.find("body[@name='table']") is not None


def test_reparent_moves_subtree_and_overrides():
  out = xml_utils.reparent_body(
      xml_str=SCENE, new_parent="table", body="arm",
      overrides={"pos": "0 0 0.1", "quat": "1 0 0 0"})
  root = ET.fromstring(out)
  arm = root.find(".//body[@name='table']/body[@name='arm']")
  assert arm is not None, "arm not moved under table"
  # old parent no longer holds it
  assert root.find(".//body[@name='mount']/body[@name='arm']") is None
  assert arm.get("pos") == "0 0 0.1"
  # orientation override cleared the euler spec
  assert arm.get("euler") is None and arm.get("quat") == "1 0 0 0"


def test_reparent_missing_body_raises():
  import pytest
  with pytest.raises(ValueError):
    xml_utils.reparent_body(xml_str=SCENE, new_parent="table", body="nope")
