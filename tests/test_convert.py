"""Checkpoint-converter tests: exact key naming vs the reference layout and
a full export->convert round trip."""
import jax
import numpy as np
import pytest

from gator_tpu.convert import convert_state_dict, export_state_dict
from gator_tpu.models import GatorSpec, init_gator


@pytest.fixture(scope="module")
def variables(small_assets):
    spec = GatorSpec.from_assets(small_assets, embed_dim=128, depth=2,
                                 alpha=False)
    return init_gator(spec, jax.random.PRNGKey(0))


def test_exported_keys_match_reference_layout(variables):
    sd = export_state_dict(variables)
    # spot-check key names against the reference module tree
    expected = [
        "pose_lifter.GLinear.0.W",
        "pose_lifter.GLinear.1.weight",
        "pose_lifter.GLinear.3.b",
        "pose_lifter.pos_id_embed.weight",
        "pose_lifter.pos_num_embed.weight",
        "pose_lifter.get_hop_path_encoding.spatial_pos_encoder.weight",
        "pose_lifter.get_hop_path_encoding.edge_encoder.weight",
        "pose_lifter.get_hop_path_encoding.W",
        "pose_lifter.blocks.0.norm1.weight",
        "pose_lifter.blocks.0.attn.qkv.weight",
        "pose_lifter.blocks.0.attn.proj.bias",
        "pose_lifter.blocks.0.gcn.W",
        "pose_lifter.blocks.0.gcn.M",
        "pose_lifter.blocks.0.gcn.adj2",
        "pose_lifter.blocks.0.x_feat.linears.0.weight",
        "pose_lifter.blocks.0.x_feat.linears.1.weight",
        "pose_lifter.blocks.0.x_feat.linearback.weight",
        "pose_lifter.blocks.1.mlp.fc1.weight",
        "pose_lifter.norm.weight",
        "pose_lifter.lifter.weight",
        "pose2mesh.pos_j_id_embed.weight",
        "pose2mesh.pos_v_id_embed.weight",
        "pose2mesh.get_joint_feature.weight",
        "pose2mesh.get_verts_feature.weight",
        "pose2mesh.encoder.attn.wq.weight",
        "pose2mesh.encoder_1.norm2.bias",
        "pose2mesh.encoder_2.mlp.fc2.bias",
        "pose2mesh.selfatt.linears.0.weight",
        "pose2mesh.selfatt_2.linears.3.bias",
        "pose2mesh.norm.a_2",
        "pose2mesh.norm_1.b_2",
        "pose2mesh.motion_linear.weight",
        "pose2mesh.bias_linear.bias",
        "pose2mesh.bias_norm.weight",
        "pose2mesh.bias_norm.running_mean",
        "pose2mesh.bias_norm.running_var",
        "pose2mesh.bias_conv1d.weight",
        "pose2mesh.upsample_conv.weight",
    ]
    for key in expected:
        assert key in sd, f"missing exported key {key}"
    # torch Linear weights are [out, in]: qkv maps 128 -> 384
    assert sd["pose_lifter.blocks.0.attn.qkv.weight"].shape == (384, 128)
    # conv kernels carry [out, in, k]
    assert sd["pose2mesh.bias_conv1d.weight"].shape[2] == 3


def test_round_trip_exact(variables):
    sd = export_state_dict(variables)
    rebuilt = convert_state_dict(sd, variables, strict=True)
    flat_a = jax.tree_util.tree_leaves(variables)
    flat_b = jax.tree_util.tree_leaves(rebuilt)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_missing_key_raises(variables):
    sd = export_state_dict(variables)
    sd.pop("pose_lifter.lifter.weight")
    with pytest.raises(KeyError, match="lifter.weight"):
        convert_state_dict(sd, variables)


def test_shape_mismatch_raises(variables):
    sd = export_state_dict(variables)
    sd["pose_lifter.lifter.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_state_dict(sd, variables)


def test_unconsumed_extra_key_raises(variables):
    sd = export_state_dict(variables)
    sd["pose_lifter.some_new_thing.weight"] = np.zeros(3)
    with pytest.raises(KeyError, match="unconsumed"):
        convert_state_dict(sd, variables)
    # reference buffers are tolerated
    sd2 = export_state_dict(variables)
    sd2["pose_lifter.graph_adj"] = np.zeros((17, 17))
    sd2["pose2mesh.init_vertices"] = np.zeros((431, 3))
    convert_state_dict(sd2, variables)


def test_alpha_variant_converts(small_assets):
    spec = GatorSpec.from_assets(small_assets, embed_dim=64, depth=1,
                                 alpha=True)
    variables = init_gator(spec, jax.random.PRNGKey(0))
    sd = export_state_dict(variables)
    assert "pose2mesh.scale_linear.weight" in sd
    assert "pose2mesh.bias_norm.weight" in sd     # LayerNorm variant
    assert "pose2mesh.bias_norm.running_mean" not in sd
    convert_state_dict(sd, variables)
