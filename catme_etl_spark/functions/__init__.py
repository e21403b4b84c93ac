from .money import cents, pct100, money_from_cents

__all__ = ["cents", "pct100", "money_from_cents"]
