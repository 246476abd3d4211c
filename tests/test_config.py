def test_object_mask_rejected_for_from_pixels():
    import pytest

    from rnet.config import load_config

    with pytest.raises(ValueError, match="state-description"):
        load_config("original-fp", overrides={"object_mask": True})
    cfg = load_config("original-sd", overrides={"object_mask": True})
    assert cfg.object_mask
