"""Unit tests for multi-step dispatch sizing (training/dispatch.py): K must
divide every event cadence, blocks must align to step boundaries, and
sharded loaders' epoch rotations must never be straddled."""

from contrad_tpu.training.dispatch import block_size, resolve_steps_per_dispatch


class _FakeLoader:
    def __init__(self, until=10**9):
        self._until = until

    def steps_until_rotation(self):
        return self._until


def test_auto_k_divides_all_cadences():
    # gcd(50, 2000, 100000) = 50 -> largest divisor <= 16 is 10
    assert resolve_steps_per_dispatch(0, True, 0, 50, 2000, 100000) == 10
    # gcd(160, 1600) = 160 -> capped at 16
    assert resolve_steps_per_dispatch(0, True, 0, 160, 1600) == 16
    # prime cadence: no divisor but 1
    assert resolve_steps_per_dispatch(0, True, 0, 7, 2000) == 1


def test_explicit_k_is_clamped_to_a_divisor():
    assert resolve_steps_per_dispatch(16, True, 0, 50, 2000) == 2  # gcd(50,16)
    assert resolve_steps_per_dispatch(10, True, 0, 50, 2000) == 10
    assert resolve_steps_per_dispatch(1, True, 0, 50, 2000) == 1


def test_disabled_paths():
    assert resolve_steps_per_dispatch(0, False, 0, 50) == 1  # no fused gather
    assert resolve_steps_per_dispatch(0, True, 5, 50) == 1   # tracing


def test_block_alignment_and_tail():
    ld = _FakeLoader()
    assert block_size(1, 4, 100, ld) == 4      # aligned
    assert block_size(5, 4, 100, ld) == 4
    assert block_size(3, 4, 100, ld) == 1      # misaligned -> single
    assert block_size(97, 4, 100, ld) == 4     # exactly fits [97..100]
    assert block_size(98, 4, 100, ld) == 1     # would overshoot max_steps


def test_block_respects_epoch_rotation():
    assert block_size(1, 4, 100, _FakeLoader(until=3)) == 1
    assert block_size(1, 4, 100, _FakeLoader(until=4)) == 4
    assert block_size(1, 4, 100, _FakeLoader(until=0)) == 1
    # loaders without rotation (replicated datasets) block freely
    assert block_size(1, 4, 100, object()) == 4


def test_event_coverage_over_a_simulated_run():
    """Walk the CLI loop structure: every print/eval step must land on a
    block end (or a single step), with a mid-run rotation forcing singles."""
    k, print_every, max_steps = 10, 50, 200
    rotation_at = 73  # next_indices() rotates when crossing this step
    fired, step = [], 1
    while step <= max_steps:
        until = max(0, rotation_at - step)
        b = block_size(step, k, max_steps, _FakeLoader(until=until))
        step += b - 1
        if step % print_every == 0:
            fired.append(step)
        step += 1
    assert fired == [50, 100, 150, 200]


class _IndexLoader:
    """Fused-gather-style loader: index streams, deferred materialization."""

    supports_indexed = True
    local_indexing = False

    def __init__(self, batch=4):
        import numpy as np

        self._np = np
        self._n = 0
        self.batch = batch
        self.gathers = 0
        self.images = "IMAGES"

    def next_indices(self):
        start = self._n * self.batch
        self._n += 1
        idx = self._np.arange(start, start + self.batch)
        return idx, idx % 10  # labels

    def materialize(self, idx):
        self.gathers += 1
        return ("batch", tuple(idx))


def test_block_dispatcher_block_and_single_paths():
    import numpy as np

    from contrad_tpu.training.dispatch import BlockDispatcher

    ld = _IndexLoader()
    d = BlockDispatcher(ld, k_dispatch=4, max_steps=100)

    blk = d.next_block(step=1)  # aligned -> full block
    assert blk.kind == "block" and blk.k == 4
    assert blk.idx_block.shape == (4, 4)
    # idx is the LAST step's indices (the eval preview shows the latest batch)
    np.testing.assert_array_equal(blk.idx, blk.idx_block[-1])
    assert len(blk.labels_block) == 4
    assert ld.gathers == 0  # nothing materialized yet
    b = blk.materialize()
    assert ld.gathers == 1 and b[1] == tuple(blk.idx)
    blk.materialize()
    assert ld.gathers == 1  # cached

    blk2 = d.next_block(step=3)  # misaligned -> single fused step
    assert blk2.kind == "indexed" and blk2.k == 1
    # stream continuity: single follows the block's 4 batches
    assert blk2.idx[0] == 4 * 4

    class _HostLoader:
        def __iter__(self):
            return self

        def __next__(self):
            return "HOSTBATCH", "LABELS"

    d3 = BlockDispatcher(_HostLoader(), k_dispatch=1, max_steps=10)
    blk3 = d3.next_block(step=1)
    assert blk3.kind == "batch" and blk3.k == 1
    assert blk3.materialize() == "HOSTBATCH" and blk3.labels == "LABELS"
