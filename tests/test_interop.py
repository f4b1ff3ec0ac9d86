"""Cross-toolchain format validation (VERDICT round-1 item #8).

(a) Repo-written streaming/spatial files are decoded here using ONLY the
    reference toolchain's documented reader logic, re-implemented verbatim
    in this test (container walk: reference ``cli.py:224-235, 297-299``;
    spatial: 1 MB prefetch -> VORBIS GEOSPATIAL_SPATIAL_INDEX ->
    base64+gzip JSON, reference ``spatial_encoder.py:446-492``).  Our codec
    stands in for libFLAC only at the final frame-decode step, which the
    parity tests validate separately against real libFLAC output.
(b) The reference's own ``sample_dem.flac`` spatial fixture round-trips
    through SpatialFLACStreamer (structure-level: that upstream fixture's
    tile payloads are all-zero, so value checks are meaningless -- and its
    offsets exhibit the reference's documented staleness bug, SURVEY.md
    Q3a, which the streamer must tolerate).
"""

import base64
import gzip
import json
import pathlib
import struct

import numpy as np
import pytest

from flac_raster_tpu.codec.decoder import decode_flac
from flac_raster_tpu.io.geo import Affine
from flac_raster_tpu.io.geotiff import write_geotiff
from flac_raster_tpu.models.flac_format import (
    parse_flac_metadata,
    parse_vorbis_comments,
)
from flac_raster_tpu.models.spatial import SpatialFLACEncoder, SpatialFLACStreamer
from flac_raster_tpu.models.streaming import create_streaming_flac

REFERENCE_TEST_DATA = pathlib.Path("/root/reference/test_data")


@pytest.fixture
def raster(tmp_path, rng):
    data = rng.integers(0, 3000, (1, 300, 400)).astype(np.int16)
    p = tmp_path / "src.tif"
    write_geotiff(p, data, crs="EPSG:4326",
                  transform=Affine(0.01, 0, -105.5, 0, -0.01, 40.5))
    return p, data


class TestStreamingContainerReferenceReader:
    """Read our --streaming output exactly as reference cli.extract does."""

    def test_reference_walk(self, tmp_path, raster):
        src, data = raster
        out = tmp_path / "s.flac"
        create_streaming_flac(src, out, tile_size=128)
        blob = out.read_bytes()

        # reference cli.py:233-235: 4-byte BE index size, then JSON index
        index_size = int.from_bytes(blob[:4], "big")
        index = json.loads(blob[4 : 4 + index_size].decode("utf-8"))

        # schema keys the reference writer produces (cli.py:605-618)
        assert {"frames"} <= set(index)
        for frame in index["frames"]:
            assert {
                "frame_id", "bbox", "window", "byte_offset", "byte_size",
            } <= set(frame)
            assert {"col_off", "row_off", "width", "height"} <= set(frame["window"])

        # reference cli.py:297-306: absolute = 4 + index_size + byte_offset
        header_size = 4 + index_size
        for frame in index["frames"]:
            a = header_size + frame["byte_offset"]
            b = a + frame["byte_size"]
            tile = blob[a:b]
            assert tile[:4] == b"fLaC"
            dec = decode_flac(tile, verify_crc=True)
            w = frame["window"]
            expect = data[:, w["row_off"]: w["row_off"] + w["height"],
                          w["col_off"]: w["col_off"] + w["width"]]
            got = dec.samples[:, 0].reshape(w["height"], w["width"])
            # our streaming tiles use lossless int16 normalization (identity)
            assert np.array_equal(got.astype(np.int64), expect[0].astype(np.int64))
        # offsets are sequential and non-overlapping (reference index
        # integrity check, tests/test_http_range_streaming.py)
        offs = [f["byte_offset"] for f in index["frames"]]
        sizes = [f["byte_size"] for f in index["frames"]]
        for i in range(1, len(offs)):
            assert offs[i] == offs[i - 1] + sizes[i - 1]
        assert header_size + offs[-1] + sizes[-1] == len(blob)


class TestSpatialFormatReferenceReader:
    """Read our --spatial output exactly as reference SpatialFLACStreamer
    does (spatial_encoder.py:434-539)."""

    def test_reference_prefetch_and_index(self, tmp_path, raster):
        src, data = raster
        enc = SpatialFLACEncoder(tile_size=128)
        out = tmp_path / "spatial.flac"
        enc.encode_spatial_flac(src, out)
        blob = out.read_bytes()

        # reference: 1 MB metadata prefetch, parse FLAC metadata, decode the
        # gzip+base64 GEOSPATIAL_SPATIAL_INDEX comment
        prefetch = blob[:1_048_576]
        _, blocks, _ = parse_flac_metadata(prefetch)
        comments = {}
        for b in blocks:
            if b.block_type == 4:
                _, comments = parse_vorbis_comments(b.data)
        packed = comments["GEOSPATIAL_SPATIAL_INDEX"][0]
        index = json.loads(gzip.decompress(base64.b64decode(packed)))
        frames = index["frames"]
        assert frames
        for f in frames:
            assert {"frame_id", "bbox", "window", "byte_offset", "byte_size"} <= set(f)

        # reference streamer fetches [byte_offset, byte_offset+byte_size):
        # every extracted range must be a complete standalone FLAC stream
        for f in frames:
            tile = blob[f["byte_offset"]: f["byte_offset"] + f["byte_size"]]
            assert tile[:4] == b"fLaC"
            dec = decode_flac(tile, verify_crc=True)
            w = f["window"]
            assert dec.samples.shape[0] == w["height"] * w["width"]

        # the first tile's stream starts at offset 0 of the file itself
        # (index embedded in tile 0's header -- our fixed-size-header design
        # keeps offsets valid, unlike the reference's post-hoc mutagen
        # rewrite, SURVEY.md Q3a)
        assert frames[0]["byte_offset"] == 0


@pytest.mark.skipif(
    not (REFERENCE_TEST_DATA / "sample_dem.flac").exists(),
    reason="reference fixture not present",
)
class TestReferenceSpatialFixture:
    """(b) the reference's own spatial file through our streamer."""

    def test_streamer_loads_reference_spatial_file(self):
        st = SpatialFLACStreamer(REFERENCE_TEST_DATA / "sample_dem.flac")
        frames = st.spatial_index.frames
        assert len(frames) >= 4
        # reference quirk Q3a: offsets were recorded BEFORE mutagen rewrote
        # the first tile's header, so they are stale by a constant shift;
        # structural invariant that still holds: sizes positive, offsets
        # strictly increasing and contiguous
        offs = [f.byte_offset for f in frames]
        sizes = [f.byte_size for f in frames]
        assert all(s > 0 for s in sizes)
        assert all(
            offs[i] == offs[i - 1] + sizes[i - 1] for i in range(1, len(offs))
        )
        # bbox query semantics (reference Q7: open-interval intersection)
        full = st.spatial_index.frames
        xmin = min(f.bbox[0] for f in full)
        ymin = min(f.bbox[1] for f in full)
        xmax = max(f.bbox[2] for f in full)
        ymax = max(f.bbox[3] for f in full)
        hits = st.get_byte_ranges_for_bbox((xmin, ymin, xmax, ymax))
        assert hits


@pytest.mark.skipif(
    not (REFERENCE_TEST_DATA / "sample_dem.flac").exists(),
    reason="reference fixture not present",
)
class TestReferenceLibflacStreams:
    """Decode the reference's committed libFLAC output directly (VERDICT r4
    #6: the best local proxy while the pyflac CI cross-check cannot run --
    these bytes were produced by libFLAC 1.4.3 via pyflac, so parsing them
    exercises real third-party frames, not our own encoder's)."""

    def test_dem_tile_streams_decode_with_crc(self):
        import re

        from flac_raster_tpu.codec.device_decoder import decode_flac_device

        blob = (REFERENCE_TEST_DATA / "sample_dem.flac").read_bytes()
        offs = [m.start() for m in re.finditer(re.escape(b"fLaC"), blob)]
        offs.append(len(blob))
        assert len(offs) - 1 == 4  # 4 spatial tiles of the 512^2 DEM
        for i in range(4):
            tile = blob[offs[i] : offs[i + 1]]
            dec = decode_flac(tile, verify_crc=True, verify_md5=True)
            # pyflac "24-bit" files are really 32 bps (SURVEY.md Q2)
            assert dec.streaminfo.bits_per_sample == 32
            assert dec.samples.shape == (256 * 256, 1)
            # upstream fixture quirk: tile payloads are all-zero (see
            # TestReferenceSpatialFixture docstring); the decode itself --
            # libFLAC frame headers, subframes, CRCs -- is what we verify
            assert not dec.samples.any()
        # tile 0 carries the GEOSPATIAL_* comment set our reader parses
        dec0 = decode_flac(blob[offs[0] : offs[1]], verify_crc=True)
        assert dec0.comments.get("GEOSPATIAL_CRS")
        assert "GEOSPATIAL_DATA_MIN" in dec0.comments
        # the device pipeline host-falls-back on foreign streams (no FRTP
        # index) and must return identical samples
        ddec = decode_flac_device(blob[offs[0] : offs[1]], verify_crc=True)
        assert np.array_equal(np.asarray(ddec.samples), dec0.samples)

    def test_rgb_normalization_matches_reference_reconstruction(self):
        """Pure-normalization parity: our reference-exact minmax encode +
        soundfile-compat decode of sample_rgb.tif reproduces the
        REFERENCE'S OWN committed reconstruction byte-for-byte, with no
        codec in the loop -- isolating the numeric contract
        (``normalization.py:126-253`` + SURVEY.md Q1) from the bitstream."""
        from flac_raster_tpu.io.geotiff import open_geotiff
        from flac_raster_tpu.ops.normalization import (
            denormalize_from_audio,
            normalize_to_audio,
        )

        rgb = open_geotiff(REFERENCE_TEST_DATA / "sample_rgb.tif").read()
        recon = open_geotiff(
            REFERENCE_TEST_DATA / "sample_rgb_reconstructed.tif"
        ).read()
        inter = np.ascontiguousarray(rgb.transpose(1, 2, 0).reshape(-1, 3))
        audio, params = normalize_to_audio(inter, 16)
        out = denormalize_from_audio(audio, params, soundfile_compat=True)
        out = out.reshape(256, 256, 3).transpose(2, 0, 1)
        assert np.array_equal(out, recon)

    def test_dem_reconstructed_structure(self):
        """sample_dem_reconstructed.tif reads through our GeoTIFF stack with
        the source DEM's exact geometry.  Values are NOT asserted: the
        committed reconstruction does not correspond to the committed
        sample_dem.tif (98% of pixels differ with mean |diff| ~17 -- far
        beyond the ~0.014 quantization step of its min-max range -- and its
        max exceeds the DEM's; upstream provenance drift, measured
        2026-08-20)."""
        from flac_raster_tpu.io.geotiff import open_geotiff

        src = open_geotiff(REFERENCE_TEST_DATA / "sample_dem.tif")
        rec = open_geotiff(REFERENCE_TEST_DATA / "sample_dem_reconstructed.tif")
        assert rec.read().shape == src.read().shape == (1, 512, 512)
        assert rec.meta["dtype"] == src.meta["dtype"] == "int16"
        assert rec.crs == src.crs
        assert tuple(rec.transform) == tuple(src.transform)
