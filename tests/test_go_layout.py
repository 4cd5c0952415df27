"""Go reference-time layout -> JDK pattern translation."""

from sdvg_spark.sinks.go_layout import go_layout_to_jdk


def test_rfc3339_default_layout():
    assert (
        go_layout_to_jdk("2006-01-02T15:04:05Z07:00")
        == "yyyy-MM-dd'T'HH:mm:ssXXX"
    )


def test_date_only():
    assert go_layout_to_jdk("2006-01-02") == "yyyy-MM-dd"


def test_datetime_space():
    assert go_layout_to_jdk("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"


def test_12h_clock_with_meridiem():
    assert go_layout_to_jdk("03:04 PM") == "hh:mm a"


def test_month_day_names():
    assert go_layout_to_jdk("Mon Jan 2 2006") == "EEE MMM d yyyy"
    assert go_layout_to_jdk("Monday, January") == "EEEE, MMMM"


def test_fractional_seconds():
    assert go_layout_to_jdk("15:04:05.000") == "HH:mm:ss.SSS"
    assert go_layout_to_jdk("15:04:05.000000") == "HH:mm:ss.SSSSSS"


def test_numeric_offsets():
    assert go_layout_to_jdk("-0700") == "xx"
    assert go_layout_to_jdk("-07:00") == "xxx"
    assert go_layout_to_jdk("Z0700") == "XX"


def test_literal_text_is_quoted():
    assert go_layout_to_jdk("at 15:04") == "'at 'HH:mm"


def test_two_digit_year_and_short_units():
    assert go_layout_to_jdk("06/1/2 3:4:5") == "yy/M/d h:m:s"
