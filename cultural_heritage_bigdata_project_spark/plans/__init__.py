from .catalog import CATALOG, CatalogQuery, catalog_queries, catalog_oracles, register

__all__ = ["CATALOG", "CatalogQuery", "catalog_queries", "catalog_oracles", "register"]
