"""Ogg container walk + Opus/Vorbis header layer (RFC 3533 / 7845)."""

import struct

import pytest

from gdal_ray.codecs.ogg import (
    _page,
    assemble_packets,
    build_ogg_opus,
    decode_opus,
    index_ogg,
    ogg_crc,
    opus_packet_samples,
    parse_opus_head,
    parse_vorbis_ident,
    walk_pages,
)


def test_crc_is_the_unreflected_ogg_variant():
    # poly 0x04C11DB7, init 0, no reflection, xorout 0 — catalogued
    # check value for the Ogg CRC
    assert ogg_crc(b"123456789") == 0x89A1897F
    assert ogg_crc(b"") == 0


def test_round_trip_counts_and_tags():
    data = build_ogg_opus([60, 120, 300, 90, 45, 200, 77, 33], channels=2,
                          preskip=312, packets_per_page=3,
                          tags={"TITLE": "t", "ARTIST": "a"})
    ix = index_ogg(data)
    assert ix["codec"] == "opus" and ix["channels"] == 2
    assert ix["n_audio_packets"] == 8
    assert ix["n_pages"] == 2 + 3 and ix["n_crc_ok"] == ix["n_pages"]
    assert ix["audio_bytes"] == sum([60, 120, 300, 90, 45, 200, 77, 33])
    assert ix["samples"] == 8 * 960           # config 1 = 20 ms SILK
    assert ix["duration_ms"] == 8 * 960 * 1000 // 48000
    assert ix["tags"] == {"TITLE": "t", "ARTIST": "a"}


def test_corrupt_page_fails_crc():
    data = bytearray(build_ogg_opus([100, 100], packets_per_page=1))
    # flip one payload byte in the last page
    data[-1] ^= 0xFF
    ix = index_ogg(bytes(data))
    assert ix["n_crc_ok"] == ix["n_pages"] - 1


def test_multi_lace_packet_within_page():
    data = build_ogg_opus([1000, 600], packets_per_page=1)
    ix = index_ogg(data)
    assert ix["n_audio_packets"] == 2
    assert ix["audio_bytes"] == 1600


def test_packet_continued_across_pages():
    # hand-build: one 400-byte packet split over two pages via an
    # unterminated 255-lacing tail
    pkt = bytes(range(256)) + bytes(range(144))
    first_half, second_half = pkt[:255], pkt[255:]
    p0 = _page(7, 0, -1, [first_half], htype=2, unterminated_tail=True)
    p1 = _page(7, 1, 400, [second_half], htype=5)  # continued + EOS
    packets, pages = assemble_packets(p0 + p1)
    assert len(pages) == 2
    assert all(p.crc_ok for p in pages)
    assert packets == [pkt]


def test_exact_255_multiple_lacing():
    # a 510-byte packet needs laces [255, 255, 0]
    data = build_ogg_opus([510], packets_per_page=1)
    packets, _ = assemble_packets(data)
    assert len(packets[2]) == 510


def test_opus_packet_samples_toc_codes():
    assert opus_packet_samples(bytes([1 << 3])) == 960          # code 0
    assert opus_packet_samples(bytes([(1 << 3) | 1])) == 1920   # code 1: 2 fr
    assert opus_packet_samples(bytes([(1 << 3) | 3, 5])) == 5 * 960
    assert opus_packet_samples(bytes([16 << 3])) == 120         # CELT 2.5 ms
    assert opus_packet_samples(bytes([31 << 3])) == 960         # CELT 20 ms


def test_opus_head_fields():
    data = build_ogg_opus([50], channels=1, preskip=123)
    packets, _ = assemble_packets(data)
    h = parse_opus_head(packets[0])
    assert h == {"version": 1, "channels": 1, "preskip": 123,
                 "input_rate": 48000, "gain_q8": 0, "mapping_family": 0}


def test_vorbis_ident():
    # version u32, channels u8, rate u32
    ident = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([2])
             + struct.pack("<I", 44100))
    v = parse_vorbis_ident(ident)
    assert v == {"channels": 2, "rate": 44100}
    page = _page(9, 0, 0, [ident], htype=2)
    ix = index_ogg(page)
    assert ix["codec"] == "vorbis" and ix["channels"] == 2


def test_decode_gated():
    with pytest.raises(NotImplementedError, match="index_ogg"):
        decode_opus(b"\x08\x00")


def test_walk_skips_garbage_prefix():
    data = b"JUNKJUNK" + build_ogg_opus([64, 64])
    assert index_ogg(data)["n_audio_packets"] == 2
