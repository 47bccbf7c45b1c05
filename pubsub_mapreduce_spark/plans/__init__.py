from .explain import (  # noqa: F401
    explain_str,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_wholestage_codegen,
)
