"""ann/quantize: symmetric int8 embedding quantization."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from axosyslog_ray.ann.quantize import (int8_quantize, int8_quantize_batch,
                                        int8_reconstruct_batch)


def _batch(vecs):
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
        "embedding": pa.array([np.asarray(v, dtype=np.float32) for v in vecs],
                              type=pa.list_(pa.float32())),
    })


class TestInt8Quantize:
    def test_codes_bounded_and_extremum_hits_127(self):
        out = int8_quantize_batch(_batch([[0.5, -1.0, 0.25], [2.0, 0.0, 1.0]]))
        q = [np.asarray(x) for x in out.column("q").to_pylist()]
        assert q[0].tolist() == [64, -127, 32]   # 0.5*127/1=63.5 -> away = 64
        assert q[1].tolist() == [127, 0, 64]
        assert out.column("qmax").to_pylist() == [64, 127]
        assert out.column("qmin").to_pylist() == [-127, 0]

    def test_half_away_not_bankers(self):
        # 0.5*127/127 = 0.5 -> +1 (banker's would give 0)
        out = int8_quantize_batch(_batch([[0.5, 127.0]]))
        assert np.asarray(out.column("q").to_pylist()[0]).tolist() == [1, 127]

    def test_zero_vector(self):
        out = int8_quantize_batch(_batch([[0.0, 0.0]]))
        assert out.column("scale").to_pylist() == [0.0]
        assert np.asarray(out.column("q").to_pylist()[0]).tolist() == [0, 0]

    def test_reconstruction_error_bounded(self):
        rng = np.random.RandomState(0)
        vecs = rng.randn(50, 16).astype(np.float32)
        out = int8_quantize_batch(_batch(list(vecs)))
        rec = int8_reconstruct_batch(out)
        scale = np.asarray(out.column("scale").to_pylist())
        # max error of the grid is scale/254 per coordinate
        err = np.abs(rec - vecs.astype(np.float64))
        assert (err <= scale[:, None] / 254.0 + 1e-12).all()

    def test_dataset_roundtrip(self, ray_session):
        rng = np.random.RandomState(1)
        df = pd.DataFrame({
            "vec_id": np.arange(40, dtype=np.int64),
            "embedding": [rng.randn(8).astype(np.float32) for _ in range(40)],
        })
        out = int8_quantize(rd.from_pandas(df).repartition(4)).to_pandas()
        assert len(out) == 40
        assert out["qmax"].max() == 127 or out["qmin"].min() == -127
