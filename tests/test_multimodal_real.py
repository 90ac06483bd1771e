"""Real multimodal kernels (decoder="real") — skipped where the media
libraries are absent (the sandbox container has neither PIL nor PyAV);
run wherever they exist. The fake-decoder plumbing contract is tested
unconditionally in tests/test_dedup_ann.py / test_media pipeline."""
import io

import numpy as np
import pyarrow as pa
import pytest

from axosyslog_ray.multimodal import DecodeImage, ExtractFeatures, FrameSampler, ResizeImage


def _png_bytes(w: int, h: int, color=(200, 10, 10)):
    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def test_real_decoder_raises_clear_import_error_when_pil_absent():
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL present: the absence branch is unreachable here")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pillow"):
        DecodeImage(decoder="real")


class TestRealImageKernels:
    @pytest.fixture(autouse=True)
    def _need_pil(self):
        pytest.importorskip("PIL")

    def test_decode_real_dimensions_and_ahash(self):
        t = pa.table({"media_id": [0, 1],
                      "payload": [_png_bytes(32, 16), _png_bytes(8, 8)]})
        out = DecodeImage(decoder="real")(t)
        assert out.column("width").to_pylist() == [32, 8]
        assert out.column("height").to_pylist() == [16, 8]
        assert out.column("n_pixels").to_pylist() == [512, 64]
        ph = out.column("phash").to_pylist()
        assert all(len(p) == 16 for p in ph)
        # solid-color image: every pixel >= mean -> all-ones hash
        assert ph[0] == "f" * 16
        assert "payload" not in out.column_names

    def test_resize_real_roundtrips_target_dims(self):
        from PIL import Image

        t = pa.table({"media_id": [0], "payload": [_png_bytes(100, 60)]})
        out = ResizeImage(target_w=24, target_h=24, decoder="real")(t)
        img = Image.open(io.BytesIO(out.column("payload").to_pylist()[0]))
        assert img.size == (24, 24)
        assert out.column("resized_w").to_pylist() == [24]

    def test_extract_features_real_shape_and_determinism(self):
        t = pa.table({"media_id": [0], "payload": [_png_bytes(64, 64)]})
        st = ExtractFeatures(dim=32, decoder="real")
        e1 = st(t).column("embedding").to_pylist()[0]
        e2 = st(t).column("embedding").to_pylist()[0]
        assert len(e1) == 32 and e1 == e2
        assert all(-0.5 <= v <= 0.5 for v in e1)


class TestRealVideoKernels:
    @pytest.fixture(autouse=True)
    def _need_av(self):
        pytest.importorskip("av")

    def test_frame_sampler_real(self, tmp_path):
        import av

        # synthesize a 3-second 2fps video in memory
        buf = io.BytesIO()
        with av.open(buf, "w", format="mp4") as container:
            stream = container.add_stream("mpeg4", rate=2)
            stream.width, stream.height = 32, 32
            for i in range(6):
                frame = av.VideoFrame.from_ndarray(
                    np.full((32, 32, 3), i * 40, dtype=np.uint8), format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode():
                container.mux(pkt)
        t = pa.table({"media_id": [7], "payload": [buf.getvalue()]})
        out = FrameSampler(every_n_seconds=1.0, decoder="real")(t)
        offs = out.column("frame_offset_sec").to_pylist()
        assert len(offs) >= 3                     # ~one frame per second
        assert out.column("media_id").to_pylist() == [7] * len(offs)
