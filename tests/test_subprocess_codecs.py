"""Exercise the BPG/VTM subprocess plumbing end-to-end with fake codec
binaries (the real ones are built by `script/software/install_{bpg,vtm}.sh`
and are absent in CI). The fakes honor the exact CLI contracts the modules
emit, so argument marshalling, tempfile handling, YUV444 10-bit packing,
and byte accounting are all executed for real."""
import os
import stat
import textwrap

import numpy as np
import pytest
from PIL import Image

from sc2bench_tpu.transforms.codec import BPGModule, VTMModule


def _write_exe(path, body):
    path.write_text('#!/usr/bin/env python3\n' + textwrap.dedent(body))
    path.chmod(path.stat().st_mode | stat.S_IEXEC)
    return str(path)


@pytest.fixture()
def fake_bpg(tmp_path):
    enc = _write_exe(tmp_path / 'bpgenc', """
        import sys, shutil
        args = sys.argv[1:]
        out = args[args.index('-o') + 1]
        src = args[-1]
        assert '-q' in args and '-f' in args and '-e' in args
        shutil.copyfile(src, out)   # "bitstream" = the PNG bytes
    """)
    dec = _write_exe(tmp_path / 'bpgdec', """
        import sys, shutil
        args = sys.argv[1:]
        out = args[args.index('-o') + 1]
        src = args[-1]
        shutil.copyfile(src, out)
    """)
    return enc, dec


@pytest.fixture()
def fake_vtm(tmp_path):
    enc = _write_exe(tmp_path / 'EncoderApp', """
        import sys, shutil
        args = sys.argv[1:]
        src = args[args.index('-i') + 1]
        out = args[args.index('-b') + 1]
        assert '-wdt' in args and '-hgt' in args and '-q' in args
        assert '--InputChromaFormat=444' in args
        shutil.copyfile(src, out)   # "bitstream" = the raw YUV
    """)
    dec = _write_exe(tmp_path / 'DecoderApp', """
        import sys, shutil
        args = sys.argv[1:]
        src = args[args.index('-b') + 1]
        out = args[args.index('-o') + 1]
        assert args[args.index('-d') + 1] == '10'
        shutil.copyfile(src, out)
    """)
    return enc, dec


def _test_image():
    rng = np.random.default_rng(0)
    return Image.fromarray(
        rng.integers(0, 256, (24, 32, 3), np.uint8), mode='RGB')


def test_bpg_module_roundtrip_with_fake_binaries(fake_bpg):
    enc, dec = fake_bpg
    codec = BPGModule(encoder_path=enc, decoder_path=dec, quality=30,
                      returns_file_size=True)
    img = _test_image()
    rec, size = codec(img)
    assert size > 0
    # the fake is lossless (PNG pass-through): bit-exact reconstruction
    np.testing.assert_array_equal(np.asarray(rec), np.asarray(img))


def test_vtm_module_roundtrip_with_fake_binaries(fake_vtm):
    enc, dec = fake_vtm
    codec = VTMModule(encoder_path=enc, decoder_path=dec, quality=40,
                      returns_file_size=True)
    img = _test_image()
    rec, size = codec(img)
    assert size == 24 * 32 * 3 * 2  # raw YUV444 10-bit in uint16
    # YCbCr 10-bit round trip: within 1/255 per channel
    diff = np.abs(np.asarray(rec, np.int32) - np.asarray(img, np.int32))
    assert diff.max() <= 1, diff.max()


def test_missing_binary_raises_with_guidance(tmp_path):
    codec = BPGModule(encoder_path=str(tmp_path / 'nope_enc'),
                      decoder_path=str(tmp_path / 'nope_dec'))
    with pytest.raises(FileNotFoundError, match='install_bpg'):
        codec(_test_image())
