"""Ingestion sources: tshark JSON, pcap (binary), queue emulation."""
