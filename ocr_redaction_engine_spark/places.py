"""Dictionary data for the broadcast dictionary-join stages.

The reference ships a 1391-entry place-name list
(/root/reference/helper/places.py) used as a token × place regex-containment
loop (SURVEY.md §2.5 F10/F26/F31). We do NOT copy that list; the *operator*
(broadcast dictionary containment join) is what we re-implement. This module
carries our own deterministic dictionaries (public-knowledge Indian city names
and common given names) used consistently by the corpus generator, the oracle,
and the Spark engine — so span-sequence equality is self-consistent.
"""

from __future__ import annotations

# Indian cities / districts (public knowledge). Matching semantics mirror the
# reference: ``re.search(place, token, IGNORECASE)`` — substring containment.
PLACES_LIST: list[str] = [
    "Mumbai", "Delhi", "Bengaluru", "Bangalore", "Hyderabad", "Ahmedabad",
    "Chennai", "Kolkata", "Surat", "Pune", "Jaipur", "Lucknow", "Kanpur",
    "Nagpur", "Indore", "Thane", "Bhopal", "Visakhapatnam", "Patna",
    "Vadodara", "Ghaziabad", "Ludhiana", "Agra", "Nashik", "Faridabad",
    "Meerut", "Rajkot", "Varanasi", "Srinagar", "Aurangabad", "Dhanbad",
    "Amritsar", "Allahabad", "Ranchi", "Howrah", "Coimbatore", "Jabalpur",
    "Gwalior", "Vijayawada", "Jodhpur", "Madurai", "Raipur", "Kota",
    "Guwahati", "Chandigarh", "Solapur", "Hubli", "Tiruchirappalli",
    "Bareilly", "Mysuru", "Mysore", "Tiruppur", "Gurgaon", "Aligarh",
    "Jalandhar", "Bhubaneswar", "Salem", "Warangal", "Guntur", "Bhiwandi",
    "Saharanpur", "Gorakhpur", "Bikaner", "Amravati", "Noida", "Jamshedpur",
    "Bhilai", "Cuttack", "Firozabad", "Kochi", "Nellore", "Bhavnagar",
    "Dehradun", "Durgapur", "Asansol", "Rourkela", "Nanded", "Kolhapur",
    "Ajmer", "Akola", "Gulbarga", "Jamnagar", "Ujjain", "Loni", "Siliguri",
    "Jhansi", "Ulhasnagar", "Jammu", "Mangaluru", "Erode", "Belgaum",
    "Ambattur", "Tirunelveli", "Malegaon", "Gaya", "Udaipur", "Maheshtala",
    "Davanagere", "Kozhikode", "Kurnool", "Rajpur", "Rajahmundry", "Bokaro",
    "Bellary", "Patiala", "Gopalpur", "Agartala", "Bhagalpur", "Muzaffarnagar",
    "Bhatpara", "Panihati", "Latur", "Dhule", "Rohtak", "Korba", "Bhilwara",
    "Berhampur", "Muzaffarpur", "Ahmednagar", "Mathura", "Kollam", "Avadi",
]

# Given names + surnames used both to plant PII into text spans and to build
# name lines on synthetic pages.
GIVEN_NAMES: list[str] = [
    "RAHUL", "PRIYA", "AMIT", "SUNITA", "VIJAY", "ANITA", "SANJAY", "KAVITA",
    "RAKESH", "POOJA", "SURESH", "NEHA", "RAMESH", "DEEPA", "ARUN", "MEENA",
    "VIKRAM", "SHILPA", "AJAY", "REKHA", "MANOJ", "GEETA", "DINESH", "SEEMA",
    "ASHOK", "USHA", "PRAKASH", "LATA", "RAJESH", "MAYA", "KIRAN", "RADHA",
    "GOPAL", "SARLA", "MOHAN", "NISHA", "HARISH", "VEENA", "NARESH", "ASHA",
    "SATISH", "BINDU", "MUKESH", "JAYA", "PAWAN", "RUPA", "ANIL", "SWATI",
    "VINOD", "TARA", "SUNIL", "DIVYA", "RAVI", "SONIA", "KAMAL", "PREETI",
    "NITIN", "SMITA", "SACHIN", "ANJALI", "ROHIT", "PALLAVI", "VARUN", "RITU",
]

SURNAMES: list[str] = [
    "SHARMA", "VERMA", "GUPTA", "SINGH", "KUMAR", "PATEL", "REDDY", "NAIR",
    "IYER", "MEHTA", "JOSHI", "DESAI", "CHOPRA", "MALHOTRA", "KAPOOR",
    "AGARWAL", "BANERJEE", "CHATTERJEE", "MUKHERJEE", "DAS", "BOSE", "GHOSH",
    "RAO", "PILLAI", "MENON", "SHETTY", "KULKARNI", "DESHPANDE", "PAWAR",
    "SHINDE", "JADHAV", "CHAUHAN", "YADAV", "MISHRA", "PANDEY", "TRIPATHI",
    "DUBEY", "TIWARI", "SAXENA", "SRIVASTAVA",
]
