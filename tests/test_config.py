def test_object_mask_rejected_for_from_pixels():
    import pytest

    from rnet.config import load_config

    with pytest.raises(ValueError, match="state-description"):
        load_config("original-fp", overrides={"object_mask": True})
    cfg = load_config("original-sd", overrides={"object_mask": True})
    assert cfg.object_mask


def test_device_augment_flag_tristate():
    """--device-augment is BooleanOptionalAction (round 5): under the
    cached/device pipelines the default is ON, --no-device-augment must
    actually turn it off (previously impossible — a no-augment A/B arm
    silently trained WITH augmentation), and the positive form stays ON
    under the pil pipeline."""
    import argparse

    from rnet.cli import add_common_args

    def cfg_for(argv):
        p = argparse.ArgumentParser()
        add_common_args(p)
        args = p.parse_args(["--clevr-dir", "/tmp/x"] + argv)
        # mirror config_from_args's pipeline default without needing dicts
        dev_aug = args.device_augment
        if args.data_pipeline in ("cached", "device") and dev_aug is None:
            dev_aug = True
        return args, dev_aug

    args, on = cfg_for(["--model", "original-fp", "--data-pipeline", "device"])
    assert args.device_augment is None and on is True
    args, off = cfg_for(
        ["--model", "original-fp", "--data-pipeline", "device", "--no-device-augment"]
    )
    assert args.device_augment is False and off is False
    args, on2 = cfg_for(["--model", "original-fp", "--device-augment"])
    assert args.device_augment is True and on2 is True
