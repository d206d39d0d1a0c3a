"""Parameter tables, row parser, heuristics, and cache behavior."""

import pytest

from mfa_tpu.ops import params
from mfa_tpu.ops.cache import TwoLevelCache
from mfa_tpu.ops.descriptors import (
    AttentionDescriptor,
    AttentionKernelType,
    GEMMDescriptor,
)


def test_parse_table():
    rows = params.parse_table("""
# comment
 64 | 512 | 1024 | 64 | Q, O
 inf | 128 | 128 | 128 |
""")
    assert len(rows) == 2
    assert rows[0].max_d == 64
    assert rows[0].block_q == 512
    assert rows[0].vmem_resident == ("Q", "O")
    assert rows[1].max_d == 0


def test_parse_rejects_bounded_last_row():
    with pytest.raises(ValueError):
        params.parse_table("64 | 1 | 1 | 1 |")


def test_row_selection():
    rows = params.parse_table("""
 64 | 512 | 512 | 64 |
128 | 256 | 256 | 128 |
inf | 128 | 128 | 128 |
""")
    assert params.select_row(rows, 32).block_q == 512
    assert params.select_row(rows, 64).block_q == 512
    assert params.select_row(rows, 65).block_q == 256
    assert params.select_row(rows, 999).block_q == 128


@pytest.mark.parametrize("ktype", ["forward", "backward_query", "backward_key_value"])
@pytest.mark.parametrize("low", [False, True])
def test_builtin_tables_parse(ktype, low):
    rows = params.parameter_table(ktype, low)
    assert rows[-1].max_d == 0


@pytest.mark.parametrize("gen_name", ["v4", "v5e", "v5p", "v6e"])
def test_vmem_budget(gen_name):
    """Every built-in table row must fit the generation's VMEM (the
    occupancy constraint of GEMMKernelDescriptor.swift:87-115, recast)."""
    gen = params.GENERATIONS[gen_name]
    for ktype in ("forward", "backward_query", "backward_key_value"):
        for low in (False, True):
            in_bytes = 2 if low else 4
            for row in params.parameter_table(ktype, low,
                                              generation=gen_name):
                d = row.max_d or 512
                est = params.vmem_bytes_estimate(row, d, in_bytes, ktype)
                assert est < gen.vmem_bytes, (
                    f"{ktype}/{'bf16' if low else 'fp32'} row max_d={row.max_d} "
                    f"needs {est/2**20:.1f} MiB > {gen.vmem_bytes/2**20:.0f} MiB "
                    f"on {gen_name}"
                )


def test_kernel_descriptor_clamps():
    desc = AttentionDescriptor(
        batch=1, num_q_heads=1, num_kv_heads=1,
        seq_len_q=64, seq_len_kv=64, head_dim=64,
    )
    kd = desc.kernel_descriptor(
        AttentionKernelType.FORWARD, params.GENERATIONS["v5e"]
    )
    assert kd.block_q <= 128  # clamped to padded seq
    assert kd.block_kv <= 128
    assert kd.block_d <= 128


def test_kernel_descriptor_d_block_divides():
    """block_d must divide padded D (the head-dim loop takes equal slices)."""
    for d in (64, 128, 160, 256, 384, 640):
        desc = AttentionDescriptor(
            batch=1, num_q_heads=1, num_kv_heads=1,
            seq_len_q=1024, seq_len_kv=1024, head_dim=d,
        )
        kd = desc.kernel_descriptor(
            AttentionKernelType.FORWARD, params.GENERATIONS["v5e"]
        )
        d_pad = ((d + 127) // 128) * 128
        assert d_pad % kd.block_d == 0, (d, kd.block_d)


def test_gqa_validation():
    with pytest.raises(ValueError):
        AttentionDescriptor(
            batch=1, num_q_heads=3, num_kv_heads=2,
            seq_len_q=8, seq_len_kv=8, head_dim=8,
        )


def test_gemm_heuristic_fits_budget():
    for shape in [(64, 64, 64), (512, 512, 512), (4096, 4096, 4096)]:
        desc = GEMMDescriptor(m=shape[0], n=shape[1], k=shape[2])
        kd = desc.kernel_descriptor(params.GENERATIONS["v5e"])
        vmem = (kd.block_m * kd.block_n * 4
                + 2 * 4 * kd.block_k * (kd.block_m + kd.block_n))
        assert vmem < params.GENERATIONS["v5e"].vmem_bytes


def test_two_level_cache():
    cache = TwoLevelCache("t")
    built = {"kernel": 0, "pipe": 0}

    def bk():
        built["kernel"] += 1
        return "K"

    def bp(kern):
        built["pipe"] += 1
        return (kern, "P")

    p1 = cache.get_pipeline("prob1", "class1", bk, bp)
    p2 = cache.get_pipeline("prob1", "class1", bk, bp)
    assert p1 is p2
    assert built == {"kernel": 1, "pipe": 1}
    # New problem, same shape class: library hit, new pipeline.
    cache.get_pipeline("prob2", "class1", bk, bp)
    assert built == {"kernel": 1, "pipe": 2}
    assert cache.stats.library_hits == 1
    assert cache.stats.pipeline_hits == 1


def test_generation_keyed_tables():
    """The table axis the reference keys per architecture
    (AttentionDescriptor+Parameters.swift:13-39): v6e (32 MiB VMEM) must
    select different rows than v5e where the v5e row was a VMEM
    compromise, and kernel_descriptor() must provably vary by generation."""
    # bwd_kv D=256: v5e ships the VMEM-capped runner-up (2048 traversal);
    # v6e ships the sweep's best (4096).
    v5e = params.select_row(
        params.parameter_table("backward_key_value", True,
                               generation="v5e"), 256)
    v6e = params.select_row(
        params.parameter_table("backward_key_value", True,
                               generation="v6e"), 256)
    assert v5e.block_q == 2048 and v6e.block_q == 4096

    # Unknown generations fall through to the measured base tables.
    v4 = params.select_row(
        params.parameter_table("backward_key_value", True,
                               generation="v4"), 256)
    assert v4 == v5e

    # End-to-end: kernel_descriptor varies by generation.
    from mfa_tpu.ops.descriptors import (AttentionDescriptor,
                                         AttentionKernelType)
    desc = AttentionDescriptor(
        batch=1, num_q_heads=8, num_kv_heads=8,
        seq_len_q=4096, seq_len_kv=4096, head_dim=256,
        low_precision_inputs=True)
    kd5 = desc.kernel_descriptor(AttentionKernelType.BACKWARD_KEY_VALUE,
                                 generation=params.GENERATIONS["v5e"])
    kd6 = desc.kernel_descriptor(AttentionKernelType.BACKWARD_KEY_VALUE,
                                 generation=params.GENERATIONS["v6e"])
    assert kd5.block_q != kd6.block_q
    assert kd6.generation == "v6e"
