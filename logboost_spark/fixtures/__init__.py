"""Deterministic fixtures: lookup (dimension) tables + transcript generator.

Every live network source in the reference (MaxMind mmdb download, 97 HTTP
threat feeds, reverse DNS, WHOIS port-43, Shodan InternetDB) is replaced by
a seeded, byte-stable lookup table (FIXTURES.md §2) so runs are
reproducible and the enrichment becomes pure broadcast joins.
"""
