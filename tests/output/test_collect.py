

def test_chunk_id_regex_ignores_prefix_digits():
    """Chunk ids parse from the LAST two index tokens (reference:
    collectors/base.py:53) — date-like prefixes must not match."""
    from sup3r_tpu.postprocessing.collectors import get_chunk_indices

    assert get_chunk_indices('era5_202401_000000_000003.h5') == (0, 3)
    assert get_chunk_indices('chunk_000001_000002.h5') == (1, 2)
    assert get_chunk_indices(
        'sup3r_chunk_000004_000005_irradiance.h5') == (4, 5)
