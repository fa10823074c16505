"""Import-path target for the dx_python entryPoint test."""


def double_it(series):
    return series * 2.0
